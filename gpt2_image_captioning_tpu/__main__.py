"""``python -m gpt2_image_captioning_tpu`` — environment smoke check
(devices, native components, tokenizer assets)."""

import argparse
import os


def main() -> None:
    parser = argparse.ArgumentParser(
        prog="python -m gpt2_image_captioning_tpu",
        description="Environment smoke check: JAX devices, native C++ "
        "components, tokenizer assets. Takes no arguments.",
    )
    parser.parse_args()
    import jax

    print(f"jax {jax.__version__}")
    print(f"default backend: {jax.default_backend()}")
    for d in jax.devices():
        print(f"  device: {d} (platform={d.platform})")

    from gpt2_image_captioning_tpu.data import native_bpe, native_pipe
    from gpt2_image_captioning_tpu.retrieval import hnsw

    for name, mod in (("hnsw index", hnsw), ("image pipeline", native_pipe),
                      ("BPE engine", native_bpe)):
        state = "built" if mod.available() else "NOT built (make -C native)"
        print(f"native {name}: {state}")
    for name, path in (("GPT-2 tokenizer", "assets/gpt2/vocab.json"),
                       ("CLIP tokenizer", "assets/clip/vocab.json")):
        state = "present" if os.path.exists(path) else "missing (scripts/download_assets.sh)"
        print(f"{name}: {state}")


if __name__ == "__main__":
    main()
