"""Precision study (performance_test_result parity): dtype x cond tables,
fp16-NaN reproduction vs bf16 finiteness."""

import numpy as np

from mixedprecisionblockqr_tpu.models.precision_study import (
    _qr_numpy_fp16,
    run_study,
    to_markdown,
    write_study,
)


def test_study_records_and_tables(tmp_path):
    study = run_study(sizes=(32,), condition_numbers=(1e3,), block_size=16)
    recs = study["records"]
    dtypes = {r["dtype"] for r in recs}
    assert {"fp16(cpu)", "bf16", "fp32", "lapack_fp64"} <= dtypes
    # Error ordering: lapack fp64 < fp32 < bf16 (on a well-conditioned case).
    get = lambda d: next(r for r in recs if r["dtype"] == d)["error"]
    assert get("lapack_fp64") < get("fp32") < get("bf16")
    md = to_markdown(study)
    assert "error.md" in md and "| 32 |" in md["error.md"]
    paths = write_study(str(tmp_path), sizes=(32,), condition_numbers=(1e3,),
                        block_size=16)
    assert len(paths) == 2


def test_fp16_overflow_vs_bf16():
    """Scaled to exceed fp16's max (~65504) mid-computation: fp16 must go
    non-finite (the reference's error.md:15-16 failure), bf16 must not."""
    rng = np.random.default_rng(0)
    A = (rng.random((24, 12)) * 400.0).astype(np.float32)
    Qh, Rh = _qr_numpy_fp16(A)
    # Column norms ~ sqrt(24)*400*0.5 ~ 1000 < 65504 -> fine; square the
    # scale so the Gram-like magnitudes overflow:
    A2 = (rng.random((24, 12)) * 60000.0).astype(np.float32)
    Qh2, Rh2 = _qr_numpy_fp16(A2)
    assert not np.isfinite(np.asarray(Rh2, np.float64)).all()
    import jax.numpy as jnp

    from mixedprecisionblockqr_tpu.ops.blockqr import block_qr
    from mixedprecisionblockqr_tpu.ops.policy import POLICY_BF16

    Qb, Rb = block_qr(A2, block_size=4, policy=POLICY_BF16, mode="complete")
    assert np.isfinite(np.asarray(Rb, np.float64)).all()
