"""Merge per-omega resolvent sweep partials into gains.json + Spectre_Sd.dat.

The remote-TPU compiler can crash on the single giant executable of the
longest-period omegas, so the production sweep runs one omega per process
(examples/cylinder_resolvent_sweep.py --omegas W --out gains_W.json); this
merges the partials, applies the interior-peak gate, and writes the
reference-convention Spectre_Sd.dat table.
"""
import glob
import json
import os
import sys

import numpy as np

outdir = sys.argv[1] if len(sys.argv) > 1 else "resolvent_out"
rows = []
meta = None
for p in sorted(glob.glob(os.path.join(outdir, "gains_*.json"))):
    d = json.load(open(p))
    rows.extend(d["points"])
    meta = d
assert rows, "no partials found"
rows.sort(key=lambda r: r["omega"])
sigs = [r["sigma"] for r in rows]
imax = int(np.argmax(sigs))
assert 0 < imax < len(sigs) - 1, f"peak at sweep boundary: {rows[imax]}"
meta["points"] = rows
meta["peak"] = dict(omega=rows[imax]["omega"], sigma=rows[imax]["sigma"],
                    strouhal=rows[imax]["omega"] / (2 * np.pi))
json.dump(meta, open(os.path.join(outdir, "gains.json"), "w"), indent=1)
np.savetxt(os.path.join(outdir, "Spectre_Sd.dat"),
           np.array([[r["omega"], r["sigma"]] for r in rows]),
           header="omega sigma1")
print("merged", len(rows), "omegas; peak:", meta["peak"])
