"""DreamSim pair scorer CLI.

Equivalent of the reference's auxiliary pair scorer
(/root/reference/evoworld/metrics/other_metrics/calculate_dreamsim.py:5-17:
load two images, score = dreamsim_model(img1, img2)). Backed by
evoworld_tpu/eval/dreamsim.py: the single-branch dino_vitb16 variant by
default, or the published 3-branch ensemble with
--runtime.dreamsim_variant=ensemble. Converted weights load from
--runtime.metric_weights_dir: dreamsim.pt (torch DINO naming, dino branch)
plus, for the ensemble, dreamsim_clip.pt / dreamsim_open_clip.pt (OpenAI
`visual.*` naming). Absent files fall back to fixed random backbones that
still score relatively.

Usage:
  python -m evoworld_tpu.cli.calculate_dreamsim \
      --data.root=<img1.png>:<img2.png>
"""

from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image

from evoworld_tpu.cli.common import logger, parse_config


def _load_torch_dict(path):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in sd.items()}


def main(argv=None):
    config = parse_config(argv)
    spec = config.data.root
    if ":" not in spec:
        raise SystemExit("--data.root must be <image1>:<image2>")
    path1, path2 = spec.split(":", 1)

    from evoworld_tpu.eval.dreamsim import (
        convert_dino_state_dict,
        convert_openai_clip_visual,
        make_dreamsim,
    )

    wdir = getattr(config.runtime, "metric_weights_dir", "")
    converters = {
        "dino_vitb16": ("dreamsim", convert_dino_state_dict),
        "clip_vitb32": ("dreamsim_clip", convert_openai_clip_visual),
        "open_clip_vitb32": ("dreamsim_open_clip", convert_openai_clip_visual),
    }
    branch_params = {}
    for branch, (stem, converter) in converters.items():
        for ext in (".pt", ".pth"):
            wpath = os.path.join(wdir, stem + ext) if wdir else ""
            if wpath and os.path.exists(wpath):
                params, report = converter(_load_torch_dict(wpath))
                if report:
                    logger.warning(
                        f"dreamsim {branch} conversion: {len(report)} issues"
                    )
                branch_params[branch] = params
                break
    model = make_dreamsim(config.runtime.dreamsim_variant, branch_params)

    def load(p):
        return np.asarray(Image.open(p).convert("RGB"), np.float32)[None] / 255.0

    score = float(model(load(path1), load(path2))[0])
    logger.info(f"dreamsim({os.path.basename(path1)}, {os.path.basename(path2)}) = {score:.5f}")
    print(json.dumps({"dreamsim": score, "weights": model.weights_tag}))


if __name__ == "__main__":
    main()
