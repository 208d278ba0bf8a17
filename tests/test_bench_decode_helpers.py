"""Unit tests for bench_decode.py's calibration helpers (the emission-
realistic decode points): the variable surgery must touch exactly the
joint fc_out head and nothing else."""

import jax
import jax.numpy as jnp
import numpy as np

from bench_decode import _with_blank_delta, _with_peaked_labels


def _fake_variables():
    rng = np.random.default_rng(0)
    return {
        "params": {
            "joint": {
                "fc_out": {
                    "kernel": jnp.asarray(
                        rng.standard_normal((8, 16)), jnp.float32
                    ),
                    "bias": jnp.asarray(
                        rng.standard_normal((16,)), jnp.float32
                    ),
                },
                "other": {"w": jnp.ones((3,), jnp.float32)},
            },
            "encoder": {"w": jnp.ones((4,), jnp.float32)},
        }
    }


def test_blank_delta_touches_only_blank_bias():
    v = _fake_variables()
    out = _with_blank_delta(v, 2.5)
    np.testing.assert_allclose(
        np.asarray(out["params"]["joint"]["fc_out"]["bias"][0]),
        np.asarray(v["params"]["joint"]["fc_out"]["bias"][0]) + 2.5,
    )
    np.testing.assert_array_equal(
        np.asarray(out["params"]["joint"]["fc_out"]["bias"][1:]),
        np.asarray(v["params"]["joint"]["fc_out"]["bias"][1:]),
    )
    np.testing.assert_array_equal(
        np.asarray(out["params"]["joint"]["fc_out"]["kernel"]),
        np.asarray(v["params"]["joint"]["fc_out"]["kernel"]),
    )
    # the original tree is untouched (the surgery reuses leaf arrays)
    assert out["params"]["encoder"]["w"] is v["params"]["encoder"]["w"]
    assert (
        out["params"]["joint"]["other"]["w"]
        is v["params"]["joint"]["other"]["w"]
    )


def test_peaked_labels_scales_and_suppresses_eos():
    v = _fake_variables()
    eos = 2
    out = _with_peaked_labels(v, 4.0, eos_index=eos)
    np.testing.assert_allclose(
        np.asarray(out["params"]["joint"]["fc_out"]["kernel"]),
        4.0 * np.asarray(v["params"]["joint"]["fc_out"]["kernel"]),
        rtol=1e-6,
    )
    b0 = 4.0 * np.asarray(v["params"]["joint"]["fc_out"]["bias"])
    got = np.asarray(out["params"]["joint"]["fc_out"]["bias"])
    np.testing.assert_allclose(
        np.delete(got, eos), np.delete(b0, eos), rtol=1e-6
    )
    assert got[eos] < b0[eos] - 250.0  # eos pushed far down
    assert out["params"]["encoder"]["w"] is v["params"]["encoder"]["w"]


def test_peaked_labels_without_eos():
    v = _fake_variables()
    out = _with_peaked_labels(v, 2.0)
    np.testing.assert_allclose(
        np.asarray(out["params"]["joint"]["fc_out"]["bias"]),
        2.0 * np.asarray(v["params"]["joint"]["fc_out"]["bias"]),
        rtol=1e-6,
    )
