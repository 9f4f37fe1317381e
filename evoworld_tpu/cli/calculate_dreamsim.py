"""DreamSim pair scorer CLI.

Equivalent of the reference's auxiliary pair scorer
(/root/reference/evoworld/metrics/other_metrics/calculate_dreamsim.py:5-17:
load two images, score = dreamsim_model(img1, img2)). Backed by the
single-branch dino_vitb16 DreamSim variant (evoworld_tpu/eval/dreamsim.py);
pass --runtime.metric_weights_dir with dreamsim.pt (torch DINO-named state
dict) for converted weights, else a fixed random backbone scores relatively.

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


def main(argv=None):
    config = parse_config(argv)
    spec = config.data.root
    if ":" not in spec:
        raise SystemExit("--data.root must be <image1>:<image2>")
    path1, path2 = spec.split(":", 1)

    from evoworld_tpu.eval.dreamsim import DreamSim, convert_dino_state_dict

    params = None
    wdir = getattr(config.runtime, "metric_weights_dir", "")
    for ext in (".pt", ".pth"):
        wpath = os.path.join(wdir, "dreamsim" + ext) if wdir else ""
        if wpath and os.path.exists(wpath):
            import torch

            sd = torch.load(wpath, map_location="cpu", weights_only=True)
            sd = {k: v.float().numpy() for k, v in sd.items()}
            params, report = convert_dino_state_dict(sd)
            if report:
                logger.warning(f"dreamsim conversion: {len(report)} issues")
            break
    model = DreamSim(params)

    def load(p):
        return np.asarray(Image.open(p).convert("RGB"), np.float32)[None] / 255.0

    score = float(model(load(path1), load(path2))[0])
    logger.info(f"dreamsim({os.path.basename(path1)}, {os.path.basename(path2)}) = {score:.5f}")
    print(json.dumps({"dreamsim": score, "weights": model.weights_tag}))


if __name__ == "__main__":
    main()
