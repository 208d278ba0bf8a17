"""GPipe pipeline parallelism over the stage mesh axis (8 virtual devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from espresso_tpu.parallel.pipeline import gpipe, stack_stage_params


def test_gpipe_matches_sequential_mlp():
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[:4])
    mesh = Mesh(devices, axis_names=("stage",))
    S, D = 4, 16
    rng = np.random.default_rng(0)
    # one dense layer per stage
    stage_params = {
        "w": jnp.asarray(rng.standard_normal((S, D, D)).astype(np.float32) * 0.3),
        "b": jnp.asarray(rng.standard_normal((S, D)).astype(np.float32) * 0.1),
    }

    def stage_fn(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    B = 8
    x = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    y = gpipe(stage_fn, stage_params, x, num_microbatches=4, mesh=mesh)

    ref = x
    for s in range(S):
        ref = jnp.tanh(
            ref @ stage_params["w"][s] + stage_params["b"][s]
        )
    assert np.abs(np.asarray(y) - np.asarray(ref)).max() < 1e-5


def test_gpipe_multiple_layers_per_stage():
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[:2])
    mesh = Mesh(devices, axis_names=("stage",))
    rng = np.random.default_rng(1)
    D = 8
    # 4 layers -> 2 stages x 2 layers
    per_layer = [
        {"w": jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) * 0.3)}
        for _ in range(4)
    ]
    stage_params = stack_stage_params(per_layer, layers_per_stage=2)

    def stage_fn(p, x):
        for i in range(2):
            x = jnp.tanh(x @ p["w"][i])
        return x

    B = 6
    x = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    y = gpipe(stage_fn, stage_params, x, num_microbatches=3, mesh=mesh)
    ref = x
    for lp in per_layer:
        ref = jnp.tanh(ref @ lp["w"])
    assert np.abs(np.asarray(y) - np.asarray(ref)).max() < 1e-5
