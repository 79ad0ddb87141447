from gpt2_image_captioning_tpu.data.tokenizer import GPT2BPETokenizer, load_gpt2_tokenizer  # noqa: F401
from gpt2_image_captioning_tpu.data.dataset import CocoDataset, CaptionData, split_coco_annotations  # noqa: F401
from gpt2_image_captioning_tpu.data.embeddings_io import load_embeddings, save_embeddings  # noqa: F401
