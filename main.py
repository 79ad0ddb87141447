"""Environment smoke check (the reference's ``main.py`` checks CUDA
availability; here: JAX platform, device inventory, native components)."""

from gpt2_image_captioning_tpu.__main__ import main

if __name__ == "__main__":
    main()
