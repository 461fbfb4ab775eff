"""Corpus-provenance stamping for scale artifacts (VERDICT r8 #6).

tools/gen_scale.py writes a ``_provenance.json`` sidecar into every
corpus it generates (src, multiplier, chained src_provenance,
row_counts). Bench/probe tools call :func:`sf_provenance` and copy the
result into their JSON output, so cross-artifact comparisons — e.g.
the r8 recall split between a chained ×10-of-×10 corpus and a direct
×100 corpus, which differ in clone mass — are self-describing instead
of relying on prose in docs/SCALE.md.
"""

from __future__ import annotations

import json
import os


def sf_provenance(sf_dir: str) -> dict:
    """The provenance block for ``sf_dir``: the generator's sidecar if
    present (with a derived ``chain`` summary like "sf0.1 x10 x10"),
    else a marker for driver-generated base testdata."""
    path = os.path.join(sf_dir.rstrip("/"), "_provenance.json")
    try:
        with open(path) as fh:
            prov = json.load(fh)
    except OSError:
        return {"generator": "driver", "dir": sf_dir, "chain": "base"}
    # flatten the nesting into one human-readable chain string
    mults: list[str] = []
    node: dict | None = prov
    root = prov.get("src", "?")
    depth = 0
    while isinstance(node, dict):
        mults.append(f"x{node.get('multiplier', '?')}")
        root = node.get("src", root)
        node = node.get("src_provenance")
        depth += 1
    prov["chain"] = root + " " + " ".join(reversed(mults))
    prov["chain_depth"] = depth
    return prov
