"""Threshold tests pinned to the committed sampler-quality artifacts
(VERDICT r3 #4: the fast serving profile's NFE/clip choices must cite
measured evidence, re-derived at production dims).

tools/sampler_quality.py trains a score and measures, per sampler config,
the solver error vs a ~500-NFE probability-flow reference and the L1 to
ground truth.  The committed artifacts are:

- runs/sampler_quality_tiny/          CPU tiny dims (r3, regression anchor)
- runs/sampler_quality/               production 44.1k dims on the TPU (r4)
  - summary_overfit_3000steps_11clips.json: a deliberately ill-conditioned
    score (3000 steps on 11 clips at 384x20) whose probability-flow ODE
    leaves the data manifold — the stress case for the clamp.
  - summary_5000steps_64clips.json: the best-conditioned score (fine-grid
    cross-agreement 0.10/bin) with the low-NFE frontier rows that justify
    configs/config_44k_turbo.yaml (11 NFE).

These tests assert the decision-relevant orderings that
configs/config_44k_fast.yaml is built on, against every artifact present:

1. solver accuracy: dpmpp at 21 NFE tracks the converged ODE at least as
   well as PLMS at 21 NFE (the sampler-swap claim);
2. fast-profile quality: dpmpp50+clip is within 15% of clipped PLMS20's
   ground-truth distance at 2.4x fewer NFE (the profile's headline);
3. safety: clipped configs stay inside the trained spec range even when
   the unclipped ODE diverges by orders of magnitude (the clamp claim).
"""

import glob
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _artifacts():
    paths = []
    for pat in ("runs/sampler_quality_tiny/summary*.json",
                "runs/sampler_quality/summary*.json",
                "runs/sampler_quality_real/summary*.json"):
        paths.extend(sorted(glob.glob(os.path.join(REPO, pat))))
    return paths


ARTIFACTS = _artifacts()


@pytest.mark.parametrize("path", ARTIFACTS,
                         ids=[os.path.relpath(p, REPO) for p in ARTIFACTS])
def test_artifact_orderings(path):
    with open(path) as f:
        s = json.load(f)
    samplers = s["samplers"]

    # 1. solver accuracy at equal NFE (21): dpmpp <= plms (both unclipped
    #    integrate the same ODE from the same x_T; distance to the fine
    #    reference is pure solver error)
    if "dpmpp50" in samplers and "plms50" in samplers:
        assert (samplers["dpmpp50"]["solver_err_l1"]
                <= samplers["plms50"]["solver_err_l1"]), path

    # 2. fast profile: dpmpp50+clip within 15% of clipped PLMS20 gt-error
    #    at 21 vs 51 NFE
    if "dpmpp50_clip" in samplers and "plms20_clip" in samplers:
        assert (samplers["dpmpp50_clip"]["gt_err_l1"]
                <= 1.15 * samplers["plms20_clip"]["gt_err_l1"]), path

    # 3. the clamp bounds every clipped DPM++ trajectory to ~the trained
    #    spec range (denorm of x0 in [-1,1]; per-bin spec stats give a
    #    little slack) even when the unclipped range blows up 50-100x.
    #    PLMS rows are excluded ON PURPOSE: its linear-multistep update
    #    extrapolates in epsilon space BETWEEN the clamped x0 evaluations,
    #    so at aggressive grids the integrate-out can still overshoot the
    #    clamp (measured: plms100_clip range [-11.1, 6.3] at 11 NFE where
    #    dpmpp100_clip stays [-5.0, 0.9]) — which is exactly why the fast/
    #    turbo profiles ship dpmpp, not plms.
    for name, r in samplers.items():
        if name.endswith("_clip") and name.startswith("dpmpp"):
            lo, hi = r["mel_range"]
            assert -8.0 <= lo <= hi <= 3.0, (name, r["mel_range"], path)

    # 4. turbo frontier: dpmpp at 11 NFE (interval 100) + clamp matches
    #    the 21-NFE fast profile's ground-truth distance within 5%, and
    #    beats clipped PLMS at the same 11 NFE (the reason the low-NFE
    #    profile is dpmpp-shaped)
    if "dpmpp100_clip" in samplers:
        if "dpmpp50_clip" in samplers:
            assert (samplers["dpmpp100_clip"]["gt_err_l1"]
                    <= 1.05 * samplers["dpmpp50_clip"]["gt_err_l1"]), path
        if "plms100_clip" in samplers:
            assert (samplers["dpmpp100_clip"]["gt_err_l1"]
                    <= samplers["plms100_clip"]["gt_err_l1"]), path


def test_artifact_set_present():
    """The committed evidence set must exist: the tiny regression anchor
    and at least one production-dims artifact."""
    rels = [os.path.relpath(p, REPO) for p in ARTIFACTS]
    assert any("sampler_quality_tiny" in r for r in rels), rels
    assert any(r.startswith("runs/sampler_quality/") for r in rels), rels
    prod = [p for p in ARTIFACTS
            if os.path.relpath(p, REPO).startswith("runs/sampler_quality/")]
    for p in prod:
        with open(p) as f:
            s = json.load(f)
        assert s["dims"] == "production 44.1k", p
        assert s["train_steps"] >= 2000, p
    # the real-singing leg (VERDICT r4 #5): at least one production-dims
    # artifact trained on windows of a real vocal recording, so the fast/
    # turbo profile orderings are pinned on real data, not only synthetic
    real = [p for p in ARTIFACTS
            if "sampler_quality_real" in os.path.relpath(p, REPO)]
    assert real, rels
    for p in real:
        with open(p) as f:
            s = json.load(f)
        assert s["dims"] == "production 44.1k", p
        assert s.get("data", "").startswith("real:"), p
        assert s["train_steps"] >= 2000, p
