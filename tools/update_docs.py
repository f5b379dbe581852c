"""Record the measured bench headline into ``docs/bench_headline.json``.

Run AFTER ``python bench.py`` on the TPU, feeding it the two JSON lines
bench.py printed (or pipe directly):

    python bench.py | tee /tmp/bench.out
    python tools/update_docs.py --round round-5 < /tmp/bench.out

``tests/test_docs_fresh.py`` then enforces that README.md and
docs/profile.md quote exactly these numbers — docs can no longer rot
silently (VERDICT r4 #4).
"""

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", required=True,
                    help="round tag, e.g. 'round-5' — must appear in "
                         "docs/profile.md's title")
    args = ap.parse_args()

    fwd_bwd = sem8 = per_step = None
    for line in sys.stdin:
        line = line.strip()
        if not line.startswith("{"):
            continue
        rec = json.loads(line)
        if rec.get("metric", "").startswith("2dgs_rays_per_s"):
            fwd_bwd = rec["value"]
            vsb = rec["vs_baseline"]
        elif rec.get("metric", "").startswith("2dgs_semantic_step"):
            sem8 = rec["value"]
            per_step = rec.get("per_step_rays_per_s")
    assert fwd_bwd and sem8, "feed bench.py's two JSON lines on stdin"

    out = {
        "round": args.round,
        "rays_per_s_fwd_bwd": fwd_bwd,
        "vs_baseline": vsb,
        "semantic_8pass_rays_per_s": sem8,
        "per_step_rays_per_s": per_step,
        "command": "python bench.py | python tools/update_docs.py "
                   f"--round {args.round}",
    }
    path = os.path.join(ROOT, "docs", "bench_headline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {path}; now update README.md and docs/profile.md — "
          "tests/test_docs_fresh.py enforces the quotes match.")


if __name__ == "__main__":
    main()
