"""DeviceFeeder tests: batch padding, wav->features, feat passthrough."""

import jax
import jax.numpy as jnp
import numpy as np

from openeat_tpu.ops.frontend import FrontendConfig
from openeat_tpu.parallel import mesh as mesh_lib
from openeat_tpu.pipeline import DeviceFeeder


def _wav_batch(rng, b, n=16000):
    return (["u%d" % i for i in range(b)], {
        "wav": np.asarray(rng.standard_normal((b, n)) * 3000, np.float32),
        "wav_lens": np.full((b,), n, np.int32),
        "targets": np.asarray(rng.integers(1, 9, (b, 4)), np.int32),
        "targets_length": np.full((b,), 4, np.int32),
    })


def test_feeder_wav_to_features(rng):
    cfg = FrontendConfig(num_mel_bins=40)
    feeder = DeviceFeeder([_wav_batch(rng, 3)], cfg, mesh=None, train=False)
    keys, batch = next(iter(feeder))
    assert batch["features"].shape[0] == 3
    assert batch["features"].shape[2] == 40
    assert "targets" in batch and batch["targets"].shape == (3, 4)


def test_feeder_pads_batch_to_mesh(rng):
    cfg = FrontendConfig(num_mel_bins=40)
    mesh = mesh_lib.make_mesh(data=8, model=1)
    feeder = DeviceFeeder([_wav_batch(rng, 6)], cfg, mesh=mesh,
                          train=False, pad_batch_multiple=8)
    keys, batch = next(iter(feeder))
    assert batch["features"].shape[0] == 8  # padded by repetition
    # repeated rows are copies of the first rows
    np.testing.assert_allclose(np.asarray(batch["features"][6]),
                               np.asarray(batch["features"][0]),
                               rtol=1e-5)
    assert batch["features"].sharding.spec[0] == "data"


def test_feeder_feat_passthrough(rng):
    cfg = FrontendConfig(num_mel_bins=8, spec_aug=False)
    feats = np.asarray(rng.standard_normal((2, 30, 8)), np.float32)
    batch = ("k", {
        "features": feats,
        "features_length": np.array([30, 20], np.int32),
        "targets": np.asarray(rng.integers(1, 5, (2, 3)), np.int32),
        "targets_length": np.full((2,), 3, np.int32),
    })
    feeder = DeviceFeeder([batch], cfg, mesh=None, train=False)
    _, out = next(iter(feeder))
    # eval path: per-utt normalization applied, shapes preserved
    assert out["features"].shape == (2, 30, 8)
    x = np.asarray(out["features"][0])
    np.testing.assert_allclose(x.mean(0), 0, atol=1e-4)


def test_feeder_device_prefetch_equivalence(rng):
    """The prefetch thread (device_prefetch=1, the default) yields the
    same batches in the same order as the synchronous path."""
    cfg = FrontendConfig(num_mel_bins=8, spec_aug=False)
    batches = [_wav_batch(np.random.default_rng(i), 2, 8000)
               for i in range(5)]
    sync = list(DeviceFeeder(batches, cfg, mesh=None, train=False,
                             device_prefetch=0))
    thr = list(DeviceFeeder(batches, cfg, mesh=None, train=False,
                            device_prefetch=1))
    assert [k for k, _ in sync] == [k for k, _ in thr]
    for (_, a), (_, b) in zip(sync, thr):
        np.testing.assert_allclose(np.asarray(a["features"]),
                                   np.asarray(b["features"]), atol=1e-6)


def test_feeder_prefetch_propagates_errors():
    cfg = FrontendConfig(num_mel_bins=8, spec_aug=False)

    def bad_loader():
        yield from ()
        raise RuntimeError("loader exploded")

    class Boom:
        def __iter__(self):
            raise RuntimeError("loader exploded")

    feeder = DeviceFeeder(Boom(), cfg, mesh=None, train=False,
                          device_prefetch=1)
    try:
        list(feeder)
    except RuntimeError as e:
        assert "loader exploded" in str(e)
    else:
        raise AssertionError("expected the loader error to propagate")
