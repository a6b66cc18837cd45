"""The analytic roofline model (utils/roofline.py): structural sanity —
floor <= model traffic, p-aware block counts, bf16 halving, device-peak
fallbacks, report fields consumed by bench.py's `roofline` extra."""

import numpy as np

from multivartv_tpu.utils import roofline as rl


def _gb(stages, ntheta):
    return sum(s.bytes_(ntheta) for s in stages) / 1e9


def test_floor_below_model():
    for m, lay in (((2048, 2048), "quartered"), ((4096, 4096), "quartered"),
                   ((256, 256, 256), "blocked"), ((128, 128, 128), "packed")):
        n = int(np.prod(m))
        model = _gb(rl.iteration_stages(m, layout=lay), n)
        floor = _gb(rl.floor_stages(m, layout=lay), n)
        assert floor < model


def test_block_count_scales_with_p():
    """p=3 has 7 difference blocks: the dual stage must move more arrays
    than at p=2 (the r4 fix — the p=2 hardcoding made the 256^3 bound
    meaningless).  r5: the tiled p=3 route carries dta/dtu adjoints out
    of the dual (2 extra writes) and its rhs collapses to a 4-array
    fused elementwise pass (the untiled p=3 model keeps the stencil
    rhs)."""
    s2 = {s.name: s for s in rl.iteration_stages((2048, 2048),
                                                 vec_bf16=False)}
    s3 = {s.name: s for s in rl.iteration_stages((256, 256, 256),
                                                 vec_bf16=False)}
    # r5.2: the rhs assembly fuses into cg.r0 (b never materializes) and
    # the dual's alpha writes are elided (B + 2 carry writes remain).
    assert "rhs" not in s2 and "rhs" not in s3
    assert s2["cg.r0"].reads == 5 and s3["cg.r0"].reads == 5
    assert s2["dual"].writes == 5 and s3["dual"].writes == 9
    s2u = {s.name: s for s in rl.iteration_stages((2048, 2048),
                                                  vec_bf16=False,
                                                  tiled=False)}
    s3u = {s.name: s for s in rl.iteration_stages((256, 256, 256),
                                                  vec_bf16=False,
                                                  tiled=False)}
    assert s2u["rhs"].reads == 7 and s2u["dual"].writes == 6
    assert s3u["rhs"].reads == 15 and s3u["dual"].writes == 14


def test_bf16_halves_cg_traffic():
    m = (4096, 4096)
    n = int(np.prod(m))
    f32 = _gb(rl.iteration_stages(m, vec_bf16=False), n)
    b16 = _gb(rl.iteration_stages(m, vec_bf16=True), n)
    assert b16 < f32
    # the non-CG stages (dual, r0) are unchanged
    for nm in ("dual", "cg.r0"):
        a = next(s for s in rl.iteration_stages(m, vec_bf16=False)
                 if s.name == nm)
        b = next(s for s in rl.iteration_stages(m, vec_bf16=True)
                 if s.name == nm)
        assert a.bytes_(n) == b.bytes_(n)


def test_auto_rule_matches_solver():
    """The model's default vec_bf16 rule must equal the solver's
    (xupdate.spectral_vec_dtype): > 2^23 knots."""
    big = {s.name: s.elem_bytes
           for s in rl.iteration_stages((4096, 4096))}
    small = {s.name: s.elem_bytes
             for s in rl.iteration_stages((2048, 2048))}
    assert big["cg.step.ap[0]"] == 2
    assert small["cg.step.ap[0]"] == 4


def test_transform_flops():
    # quartered = half of blocked per axis; MAC = 2 flops
    q = rl._transform_flops_per_knot((4096, 4096), "quartered")
    b = rl._transform_flops_per_knot((4096, 4096), "blocked")
    assert abs(q * 2 - b) < 1e-9
    assert abs(q - 2 * (4096 / 4) * 2) < 1e-9


def test_device_peaks_fallback():
    assert rl.device_peaks("TPU v5 lite") == (819.0, 197.0)
    assert rl.device_peaks("TPU v4") == (1228.0, 275.0)
    assert rl.device_peaks("unknown-part") == rl._DEFAULT_PEAK


def test_model_report_fields():
    r = rl.model_report((4096, 4096), kind="v5 lite",
                        measured_iters_per_s=115.0)
    for k in ("model_bound_iters_per_s", "floor_bound_iters_per_s",
              "frac_of_model_bound", "frac_of_floor_bound",
              "achieved_gbps", "vec_bf16"):
        assert k in r
    assert 0 < r["frac_of_model_bound"] < 1.2
    assert r["floor_bound_iters_per_s"] > r["model_bound_iters_per_s"]


def test_model_report_residency_caveat():
    # 2048^2 f32: the measured program keeps some inter-stage arrays
    # on-chip, so the HBM-traffic model's implied bandwidth exceeds the
    # streaming ceiling -- the report must flag the row as a lower-bound
    # ratio rather than an efficiency (VERDICT r4 weak #2).
    hot = rl.model_report((2048, 2048), kind="v5 lite",
                          measured_iters_per_s=708.0)
    assert hot["frac_of_model_bound"] > 1.0
    assert "hbm_model_uninformative" in hot
    # 4096^2 streams from HBM for real: no caveat.
    cool = rl.model_report((4096, 4096), kind="v5 lite",
                           measured_iters_per_s=127.0)
    assert "hbm_model_uninformative" not in cool
