"""CLI entry point: `python -m labelany3d_tpu.pipeline.runner <stage> ...`.

Flag parity with every reference batch script
(`src/batch_scripts/depth.py:96-105`): --config, --start_index, --end_index,
--split, --save_dir, plus dotted `key=value` config overrides. Stages:

  depth           stage 1  (MoGe+DepthPro -> aligned depth)
  enhance         stage 2  (super-resolution backend)
  crops           stage 3  (instance crops)
  completion      stage 4  (amodal completion backend)
  elevation       stage 5  (per-object elevation backend)
  reconstruction  stage 6  (image->3D backend)
  layout          stage 7  (register meshes + ground-aligned boxes)
  boxes           stage 7's depth-only fast path (no generative stack)
  export          stage 8  (COCO3D Omni3D JSON)
  fast            depth -> crops -> boxes -> export
  all             the full 8-stage path over the index range
"""

from __future__ import annotations

import argparse

from labelany3d_tpu.data.coconut import CoconutLoader, get_dataset_paths
from labelany3d_tpu.pipeline.backends import register_default_backends
from labelany3d_tpu.pipeline.config import PipelineConfig, load_config
from labelany3d_tpu.pipeline.stages import (
    BoxStage,
    CompletionStage,
    CropStage,
    DepthStage,
    ElevationStage,
    EnhanceStage,
    ExportStage,
    LayoutStage,
    ReconstructionStage,
)
from labelany3d_tpu.pipeline.stages.common import FileImageSource

_STAGES = [
    "depth", "enhance", "crops", "completion", "elevation",
    "reconstruction", "layout", "boxes", "export", "fast", "all",
]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="LabelAny3D-TPU pipeline runner")
    p.add_argument("stage", choices=_STAGES)
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--start_index", type=int, default=0)
    p.add_argument("--end_index", type=int, default=1)
    p.add_argument("--split", default="val")
    p.add_argument("--save_dir", default="../experimental_results/COCO/")
    p.add_argument("--dataset_root", default="../dataset/coco")
    p.add_argument(
        "--wild", action="store_true",
        help="in-the-wild mode: --dataset_root is a plain image folder; "
             "instances come from the wild segmentation stack instead of "
             "COCONUT annotations (reference stack E)",
    )
    return p


def main(argv=None) -> int:
    parser = build_parser()
    args, extras = parser.parse_known_args(argv)
    cfg_node = load_config(args.config, extras)
    cfg = PipelineConfig.from_node(cfg_node)

    provider = None
    if args.wild:
        from labelany3d_tpu.data.sources import DirectoryLoader, WildInstanceProvider
        from labelany3d_tpu.data.wild import make_wild_source

        images_root = args.dataset_root
        loader = DirectoryLoader(images_root)
        provider = WildInstanceProvider(make_wild_source(
            foreground=str(cfg_node.run.wild_foreground),
            tagger=str(cfg_node.run.wild_tagger),
            segmentation=str(cfg_node.run.wild_segmentation),
            clipseg_path=cfg_node.models.clipseg_path,
            clip_path=cfg_node.models.clip_path,
            sam_path=cfg_node.models.sam_path,
            segformer_path=cfg_node.models.segformer_path,
        ))
    else:
        images_root, annotations_dir = get_dataset_paths(args.split, args.dataset_root)
        loader = CoconutLoader(split=args.split, annotations_dir=annotations_dir)
    args.end_index = min(args.end_index, len(loader))
    args.start_index = min(args.start_index, args.end_index)
    source = FileImageSource(images_root)
    register_default_backends()

    def run_depth():
        from labelany3d_tpu.models.registry import get_model

        # models.tiny overrides the preset (same contract as other stages).
        preset = "tiny_test" if bool(cfg_node.models.tiny) else str(cfg_node.models.moge.preset)
        # Pin pos-embed grids to the configured primary bucket so parameter
        # shapes are independent of dataset iteration order.
        backend = get_model("depth", preset=preset, pin_hw=cfg.bucket_sizes()[0])
        stage = DepthStage(cfg, backend, loader, source, args.save_dir, args.split)
        n = stage.run(args.start_index, args.end_index)
        print(f"[depth] processed {n} images")
        return n

    def run_crops():
        n = CropStage(cfg, loader, source, args.save_dir, args.split,
                      instance_provider=provider).run(args.start_index, args.end_index)
        print(f"[crops] processed {n} images")
        return n

    def run_boxes():
        n = BoxStage(cfg, loader, args.save_dir, args.split,
                     instance_provider=provider).run(args.start_index, args.end_index)
        print(f"[boxes] processed {n} images")
        return n

    def run_export():
        out = ExportStage(args.save_dir, args.split).run()
        print(
            f"[export] {len(out['images'])} images, "
            f"{len(out['annotations'])} annotations"
        )

    def _backend(name, **kw):
        from labelany3d_tpu.models.registry import get_model

        if bool(cfg_node.models.get("tiny", False)):
            kw.setdefault("tiny", True)
        return get_model(name, **kw)

    def run_enhance():
        # run.enhance backend: 'bicubic' (default) | 'invsr'
        be = _backend("enhance", backend=str(cfg_node.run.get("enhance", "bicubic")))
        n = EnhanceStage(cfg, loader, source, args.save_dir, args.split,
                         backend=be).run(args.start_index, args.end_index)
        print(f"[enhance] processed {n} images")
        return n

    def run_completion():
        # Parity: run.amodal_completion 'our' | null (src/configs/image.yaml)
        mode = cfg_node.run.get("amodal_completion")
        be = _backend("completion", backend="our" if mode == "our" else "none")
        n = CompletionStage(cfg, loader, args.save_dir, args.split,
                            backend=be).run(args.start_index, args.end_index)
        print(f"[completion] processed {n} images")
        return n

    def run_elevation():
        be = _backend("elevation", backend=str(cfg_node.run.get("elevation", "zero")))
        n = ElevationStage(cfg, loader, args.save_dir, args.split,
                           backend=be).run(args.start_index, args.end_index)
        print(f"[elevation] processed {n} images")
        return n

    def run_reconstruction():
        # Parity: run.obj_rec 'trellis' | 'hunyuan3d' (+ 'silhouette' here)
        be = _backend("reconstruction",
                      backend=str(cfg_node.run.get("obj_rec", "silhouette")),
                      ckpt_dir=cfg_node.models.get("ckpt_dir"))
        n = ReconstructionStage(cfg, loader, args.save_dir, args.split,
                                backend=be).run(args.start_index, args.end_index)
        print(f"[reconstruction] processed {n} images")
        return n

    def run_layout():
        n = LayoutStage(cfg, loader, args.save_dir, args.split,
                        matcher=_backend("matcher")).run(args.start_index, args.end_index)
        print(f"[layout] processed {n} images")
        return n

    def run_fused():
        from labelany3d_tpu.models.registry import get_model
        from labelany3d_tpu.pipeline.stages.fused import FusedFastStage

        preset = "tiny_test" if bool(cfg_node.models.tiny) else str(cfg_node.models.moge.preset)
        backend = get_model("depth", preset=preset, pin_hw=cfg.bucket_sizes()[0])
        n = FusedFastStage(cfg, backend, loader, source, args.save_dir,
                           args.split, instance_provider=provider,
                           ).run(args.start_index, args.end_index)
        print(f"[fast] processed {n} images")
        return n

    dispatch = {
        "depth": [run_depth],
        "enhance": [run_enhance],
        "crops": [run_crops],
        "completion": [run_completion],
        "elevation": [run_elevation],
        "reconstruction": [run_reconstruction],
        "layout": [run_layout],
        "boxes": [run_boxes],
        "export": [run_export],
        # depth + boxes fused into one device pass per batch (artifacts
        # identical to the stage chain); crops stays a separate pass.
        "fast": [run_fused, run_crops, run_export],
        "all": [run_depth, run_enhance, run_crops, run_completion,
                run_elevation, run_reconstruction, run_layout, run_export],
    }
    from labelany3d_tpu.utils.profiling import GLOBAL_TIMER

    # Multi-stage routes unload between stages: each stage's weights are
    # 1-2 GB on device (three SD-class UNets along `all`), and the v5e's
    # 16 GB HBM cannot hold every stage's models at once — measured
    # RESOURCE_EXHAUSTED at reconstruction with everything resident.
    # Parity: the reference frees stage models via `model_wrappers.py`
    # unload (:435-451) and runs its batch scripts as separate processes.
    multi = len(dispatch[args.stage]) > 1
    for fn in dispatch[args.stage]:
        name = fn.__name__.replace("run_", "")
        with GLOBAL_TIMER.measure(name):
            n = fn()
        if isinstance(n, int):
            GLOBAL_TIMER.add_items(name, n)
        if multi:
            import gc

            from labelany3d_tpu.models.registry import unload_all_models

            unload_all_models()
            gc.collect()
    print(GLOBAL_TIMER.report())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
