"""Documentation freshness gate (VERDICT r4 #4 — three rounds of perf
docs rotting while the measured numbers lived only in commit messages).

The contract: every committed perf headline lives in
``docs/bench_headline.json`` (written by ``tools/update_docs.py`` from a
real bench run), and README.md / docs/profile.md must quote exactly the
numbers recorded there. Regenerating the headline without updating the
prose — or editing the prose without re-measuring — fails this test
loudly instead of silently aging.
"""

import json
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(path):
    with open(os.path.join(ROOT, path)) as f:
        return f.read()


@pytest.fixture(scope="module")
def headline():
    p = os.path.join(ROOT, "docs", "bench_headline.json")
    assert os.path.exists(p), (
        "docs/bench_headline.json missing — run tools/update_docs.py "
        "after bench.py on the TPU")
    with open(p) as f:
        return json.load(f)


def test_readme_quotes_headline(headline):
    readme = _read("README.md")
    fwd_bwd = headline["rays_per_s_fwd_bwd"]
    tag = f"{fwd_bwd / 1e6:.1f}M rays/s"
    assert tag in readme, (
        f"README.md must quote the measured headline '{tag}' "
        f"(docs/bench_headline.json); found a stale number instead")
    sem = headline["semantic_8pass_rays_per_s"]
    sem_tag = f"{sem / 1e6:.1f}M rays/s"
    assert sem_tag in readme, (
        f"README.md must quote the late-phase headline '{sem_tag}'")


def test_profile_doc_matches_headline(headline):
    prof = _read("docs/profile.md")
    assert headline["round"] in prof, (
        f"docs/profile.md must be regenerated for {headline['round']} "
        "(its title carries the round tag)")
    tag = f"{headline['rays_per_s_fwd_bwd'] / 1e6:.1f}M rays/s"
    assert tag in prof, (
        f"docs/profile.md must quote the measured headline '{tag}'")


def test_no_orphan_numbers_in_readme(headline):
    """Any 'NN.NM rays/s' in README must be one of the recorded
    headline values — stale numbers fail by construction."""
    readme = _read("README.md")
    allowed = {f"{headline['rays_per_s_fwd_bwd'] / 1e6:.1f}",
               f"{headline['semantic_8pass_rays_per_s'] / 1e6:.1f}",
               f"{headline.get('per_step_rays_per_s', 0) / 1e6:.1f}",
               "24.0"}   # the BASELINE.md denominator estimate
    for m in re.finditer(r"(\d+(?:\.\d+)?)M rays/s", readme):
        assert m.group(1) in allowed, (
            f"README quotes '{m.group(0)}' which is not in "
            f"docs/bench_headline.json {sorted(allowed)} — stale?")
