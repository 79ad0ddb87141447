"""Environment smoke check (the reference's ``main.py`` checks CUDA
availability; here: JAX platform, device inventory, native components)."""

import os


def main() -> None:
    import jax

    print(f"jax {jax.__version__}")
    print(f"default backend: {jax.default_backend()}")
    for d in jax.devices():
        print(f"  device: {d} (platform={d.platform})")

    from gpt2_image_captioning_tpu.data import native_pipe
    from gpt2_image_captioning_tpu.retrieval import hnsw

    print(f"native hnsw index: {'built' if hnsw.available() else 'NOT built (make -C native)'}")
    print(
        f"native image pipeline: "
        f"{'built' if native_pipe.available() else 'NOT built (make -C native)'}"
    )
    for name, path in (("GPT-2 tokenizer", "assets/gpt2/vocab.json"),
                       ("CLIP tokenizer", "assets/clip/vocab.json")):
        state = "present" if os.path.exists(path) else "missing (scripts/download_assets.sh)"
        print(f"{name}: {state}")


if __name__ == "__main__":
    main()
