"""Root-level shim so ``python -m sweep`` works from the repo root, like the
reference's ``uv run -m sweep`` entry point."""

from gpt2_image_captioning_tpu.sweep import main

if __name__ == "__main__":
    main()
