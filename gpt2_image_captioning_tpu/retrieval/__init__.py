from gpt2_image_captioning_tpu.retrieval.exact import DeviceVectorStore  # noqa: F401
