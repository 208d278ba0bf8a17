"""--user-dir plugin loading (common.user_dir): an external directory is
imported as a package and registers tasks/models/criterions against
espresso_tpu.registry, then trains through the real CLI.

Reference: fairseq/utils.py:487-528 ``import_user_module`` + the
``--user-dir`` flag (fairseq/dataclass/configs.py CommonConfig.user_dir);
test pattern after fairseq's tests/test_utils.py user-dir coverage.
"""

import os
import textwrap

import numpy as np
import pytest

from tests.utils import make_corpus

PLUGIN = textwrap.dedent(
    '''
    """Test plugin: registers a criterion and an architecture preset."""
    import dataclasses

    from espresso_tpu.criterions import CRITERIONS, build_criterion
    from espresso_tpu.registry import register_architecture


    @CRITERIONS.register("user_plugin_xent")
    class UserPluginXent:
        """Delegates to the builtin cross_entropy_v2 but proves external
        registration end to end."""

        def __init__(self, cfg, task):
            self._inner = build_criterion(
                dataclasses.replace(cfg, name="cross_entropy_v2"), task
            )

        def __call__(self, *args, **kwargs):
            return self._inner(*args, **kwargs)

        def __getattr__(self, name):  # logging_keys etc.
            return getattr(self._inner, name)


    @register_architecture("speech_lstm", "user_plugin_tiny_lstm")
    def tiny_lstm(cfg):
        cfg.conv_channels = (4,)
        cfg.conv_kernel_sizes = ((3, 3),)
        cfg.conv_strides = ((2, 2),)
        cfg.encoder_hidden_size = 16
        cfg.encoder_layers = 1
        cfg.decoder_embed_dim = 8
        cfg.decoder_hidden_size = 16
        cfg.decoder_out_embed_dim = 16
        cfg.decoder_layers = 1
        cfg.attention_dim = 16
        cfg.dropout = 0.0
    '''
)


def _write_plugin(tmp_path, name="espresso_user_plugin"):
    plug = tmp_path / name
    plug.mkdir()
    (plug / "__init__.py").write_text(PLUGIN)
    return str(plug)


def test_user_dir_registers_and_trains(tmp_path):
    from espresso_tpu.cli.train import main

    d = str(tmp_path / "data")
    os.makedirs(d)
    make_corpus(d, "train", num_utts=12, feat_dim=8, seed=0)
    make_corpus(d, "valid", num_utts=4, feat_dim=8, seed=1)
    plug = _write_plugin(tmp_path)

    stats = main(
        [
            f"common.user_dir={plug}",
            f"dataset.data={d}",
            f"checkpoint.save_dir={d}/ckpt",
            "dataset.max_tokens=800",
            "dataset.feat_dim=8",
            "optimization.lr=0.003",
            "common.dtype=float32",
            "model.name=user_plugin_tiny_lstm",
            "criterion.name=user_plugin_xent",
            "optimization.max_epoch=1",
        ]
    )
    assert np.isfinite(stats["loss"])


def test_user_dir_missing_raises(tmp_path):
    from espresso_tpu.config import parse_config

    with pytest.raises(FileNotFoundError):
        parse_config([f"common.user_dir={tmp_path}/nope"])


def test_user_dir_name_collision_raises(tmp_path):
    from espresso_tpu.registry import import_user_module

    a = tmp_path / "a" / "collide_mod"
    b = tmp_path / "b" / "collide_mod"
    for p in (a, b):
        p.mkdir(parents=True)
        (p / "__init__.py").write_text("")
    import_user_module(str(a))
    import_user_module(str(a))  # idempotent
    with pytest.raises(ImportError):
        import_user_module(str(b))
