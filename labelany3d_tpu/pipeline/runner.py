"""CLI entry point: `python -m labelany3d_tpu.pipeline.runner <stage> ...`.

Flag parity with every reference batch script
(`src/batch_scripts/depth.py:96-105`): --config, --start_index, --end_index,
--split, --save_dir, plus dotted `key=value` config overrides. Stages:

  depth     stage 1  (MoGe+DepthPro -> aligned depth)
  crops     stage 3  (instance crops)
  boxes     stage 7's geometric core (depth-driven 3D boxes)
  export    stage 8  (COCO3D Omni3D JSON)
  all       depth -> crops -> boxes -> export over the index range
"""

from __future__ import annotations

import argparse

from labelany3d_tpu.data.coconut import CoconutLoader, get_dataset_paths
from labelany3d_tpu.pipeline.backends import JaxDepthBackend, register_default_backends
from labelany3d_tpu.pipeline.config import PipelineConfig, load_config
from labelany3d_tpu.pipeline.stages import BoxStage, CropStage, DepthStage, ExportStage
from labelany3d_tpu.pipeline.stages.common import FileImageSource


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="LabelAny3D-TPU pipeline runner")
    p.add_argument("stage", choices=["depth", "crops", "boxes", "export", "all"])
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--start_index", type=int, default=0)
    p.add_argument("--end_index", type=int, default=1)
    p.add_argument("--split", default="val")
    p.add_argument("--save_dir", default="../experimental_results/COCO/")
    p.add_argument("--dataset_root", default="../dataset/coco")
    return p


def main(argv=None) -> int:
    parser = build_parser()
    args, extras = parser.parse_known_args(argv)
    cfg_node = load_config(args.config, extras)
    cfg = PipelineConfig.from_node(cfg_node)

    images_root, annotations_dir = get_dataset_paths(args.split, args.dataset_root)
    loader = CoconutLoader(split=args.split, annotations_dir=annotations_dir)
    args.end_index = min(args.end_index, len(loader))
    args.start_index = min(args.start_index, args.end_index)
    source = FileImageSource(images_root)
    register_default_backends()

    def run_depth():
        preset = str(cfg_node.models.moge.preset)
        backend = JaxDepthBackend() if preset == "large" else None
        if backend is None:
            from labelany3d_tpu.models.registry import get_model

            backend = get_model("depth", preset=preset)
        stage = DepthStage(cfg, backend, loader, source, args.save_dir, args.split)
        n = stage.run(args.start_index, args.end_index)
        print(f"[depth] processed {n} images")

    def run_crops():
        n = CropStage(cfg, loader, source, args.save_dir, args.split).run(
            args.start_index, args.end_index
        )
        print(f"[crops] processed {n} images")

    def run_boxes():
        n = BoxStage(cfg, loader, args.save_dir, args.split).run(
            args.start_index, args.end_index
        )
        print(f"[boxes] processed {n} images")

    def run_export():
        out = ExportStage(args.save_dir, args.split).run()
        print(
            f"[export] {len(out['images'])} images, "
            f"{len(out['annotations'])} annotations"
        )

    dispatch = {
        "depth": [run_depth],
        "crops": [run_crops],
        "boxes": [run_boxes],
        "export": [run_export],
        "all": [run_depth, run_crops, run_boxes, run_export],
    }
    for fn in dispatch[args.stage]:
        fn()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
