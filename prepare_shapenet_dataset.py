#!/usr/bin/env python3
"""Prepare ShapeNetCore.v2 categories into training artifacts.

Role parity with /root/reference/prepare_shapenet_dataset.py: walks
``<dataset>/<synset>/<id>/models/model_normalized.obj``, produces voxel
grids, uniform/surface point sets and DeepSDF clouds per shape under
``data/<category-name>/...``, then optionally combines clouds into the
monolithic autodecoder tensors.

Usage:
    python3 prepare_shapenet_dataset.py --dataset data/shapenet/ShapeNetCore.v2 \\
        --categories chairs [--limit N] [--combine] [--split]
"""

import argparse
import glob
import os

from shapegan_tpu.data.prepare import (
    PrepareConfig,
    combine_sdf_clouds,
    process_mesh_files,
    write_split_file,
)
from shapegan_tpu.data.shapenet import ShapeNetMetadata

CATEGORY_ALIASES = {"chairs": "chair", "airplanes": "airplane", "sofas": "sofa"}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="data/shapenet/ShapeNetCore.v2")
    parser.add_argument("--categories", nargs="+", default=["chairs"])
    parser.add_argument("--output", default="data")
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--workers", type=int, default=None)
    parser.add_argument("--combine", action="store_true")
    parser.add_argument("--split", action="store_true")
    args = parser.parse_args()

    metadata = ShapeNetMetadata(args.dataset)
    name_to_synset = {}
    for synset, cat in metadata.categories.items():
        name_to_synset[cat.name] = synset

    for category in args.categories:
        name = CATEGORY_ALIASES.get(category, category)
        synset = name_to_synset.get(name)
        if synset is None:
            raise SystemExit(f"unknown category {category}; have {sorted(name_to_synset)}")
        pattern = os.path.join(args.dataset, synset, "*", "models", "model_normalized.obj")
        paths = sorted(glob.glob(pattern))
        if args.limit:
            paths = paths[: args.limit]
        if not paths:
            raise SystemExit(f"no meshes found for {category} under {pattern}")
        print(f"{category}: {len(paths)} meshes")
        config = PrepareConfig(
            output_dir=os.path.join(args.output, category), id_mode="shapenet"
        )
        process_mesh_files(paths, config, workers=args.workers)
        if args.split:
            write_split_file(config)
        if args.combine:
            combine_sdf_clouds(config, out_dir=args.output)


if __name__ == "__main__":
    main()
