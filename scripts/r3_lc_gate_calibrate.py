"""Print measured lightcone-parity stats per config to calibrate test gates."""
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))
from run_parity import band_stats  # noqa: E402

for path in sorted((REPO / "tests/parity_data").glob("*.lc.json")):
    res = json.loads(path.read_text())
    name = res["config"]
    out = [name]
    gx = res["globals"].get("global_neutral_fraction", {})
    if "gold" in gx:
        out.append(f"xh_dev={np.max(np.abs(np.asarray(gx['mean']) - np.asarray(gx['gold']))):.4f}")
    gt = res["globals"].get("global_brightness_temp", {})
    if "gold" in gt:
        out.append(f"tb_dev={np.max(np.abs(np.asarray(gt['mean']) - np.asarray(gt['gold']))):.2f}mK")
    for f in ("brightness_temp", "neutral_fraction", "density"):
        e = res["fields"].get(f, {})
        if "gold" in e:
            st = band_stats(res["k"], e["gold"], e["mean"], e.get("std"), runs=e.get("runs"))
            if st:
                out.append(f"{f}:r={st['band_ratio']:.3f},z={st.get('band_z', float('nan')):+.1f}")
    print("  ".join(out))
