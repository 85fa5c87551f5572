"""Latent dataset / length-grouped sampler / prefetch loader
(the TPU-native slice of the reference trainer's fastvideo data path,
distill_with_cfg_sch_5s_exp0.py:469-492)."""

import json

import numpy as np
import pytest

from wanq_tpu.training.data import (
    LatentDataset,
    length_grouped_batches,
    prefetch_to_device,
)


@pytest.fixture
def dataset_dir(tmp_path, rng):
    """6 samples: 4 with F=4, 2 with F=6; one uses a separate context file."""
    entries = []
    for i, f in enumerate([4, 4, 6, 4, 6, 4]):
        lat = rng.standard_normal((16, f, 4, 4)).astype(np.float32)
        ctx = rng.standard_normal((16, 32)).astype(np.float32)
        name = f"sample_{i}.npz"
        if i == 0:
            np.savez(tmp_path / name, latents=lat)
            np.savez(tmp_path / f"ctx_{i}.npz", context=ctx)
            entries.append({"latent": name, "context": f"ctx_{i}.npz"})
        else:
            np.savez(tmp_path / name, latents=lat, context=ctx)
            entries.append({"latent": name})
    index = tmp_path / "index.json"
    index.write_text(json.dumps(entries))
    return index


def test_dataset_items_and_lengths(dataset_dir):
    ds = LatentDataset(str(dataset_dir))
    assert len(ds) == 6
    assert ds.lengths() == [4, 4, 6, 4, 6, 4]
    s0 = ds[0]
    assert s0["latents"].shape == (16, 4, 4, 4)
    assert s0["context"].shape == (16, 32)  # separate context file
    s2 = ds[2]
    assert s2["latents"].shape == (16, 6, 4, 4)


def test_num_latent_t_trims(dataset_dir):
    ds = LatentDataset(str(dataset_dir), num_latent_t=4)
    assert ds.lengths() == [4] * 6
    assert ds[2]["latents"].shape[1] == 4


def test_length_grouped_batches_uniform_and_deterministic():
    lengths = [4, 4, 6, 4, 6, 4]
    b1 = length_grouped_batches(lengths, 2, seed=0)
    b2 = length_grouped_batches(lengths, 2, seed=0)
    assert b1 == b2
    assert length_grouped_batches(lengths, 2, seed=1) != b1 or len(b1) <= 1
    # every batch has a single length; all batches full-size
    for batch in b1:
        assert len(batch) == 2
        assert len({lengths[i] for i in batch}) == 1
    # 4 samples of F=4 -> 2 batches, 2 of F=6 -> 1 batch
    assert len(b1) == 3


def test_prefetch_to_device_shapes_and_coverage(dataset_dir):
    ds = LatentDataset(str(dataset_dir))
    batches = length_grouped_batches(ds.lengths(), 2, seed=0)
    seen = []
    for dev_batch in prefetch_to_device(ds, batches, prefetch=2):
        lat = np.asarray(dev_batch["latents"])
        ctx = np.asarray(dev_batch["context"])
        assert lat.shape[0] == 2 and ctx.shape == (2, 16, 32)
        assert lat.shape[2] in (4, 6)
        seen.append(lat.shape)
    assert len(seen) == len(batches)


@pytest.mark.slow
def test_prefetch_feeds_distill_step(dataset_dir, rng):
    """End-to-end: loader batches drive one LoRA-free distill step."""
    import jax
    import jax.numpy as jnp

    from tests.conftest import randomize_head
    from wanq_tpu.configs import tiny_config
    from wanq_tpu.models.dit import init_params
    from wanq_tpu.training.distill import (
        DistillConfig,
        distill_step,
        init_train_state,
        make_distill_step,
    )

    cfg = tiny_config()
    teacher = randomize_head(init_params(cfg, jax.random.PRNGKey(0)), seed=7)
    student = randomize_head(init_params(cfg, jax.random.PRNGKey(1)), seed=8)
    dcfg = DistillConfig(learning_rate=1e-3, seq_len=8)
    state, tx = init_train_state(student, dcfg)
    step_fn = make_distill_step(cfg, dcfg, tx)

    ds = LatentDataset(str(dataset_dir), num_latent_t=2)
    batches = length_grouped_batches(ds.lengths(), 1, seed=0)[:2]
    for dev_batch in prefetch_to_device(ds, batches):
        lat = dev_batch["latents"][:, : cfg.in_dim, :, : 8, : 8]
        n = lat.shape[0]
        batch = {
            "x0": lat[:, :, :, :4, :4],
            "noise": jnp.zeros_like(lat[:, :, :, :4, :4]),
            "t": jnp.full((n,), 500.0),
            "context": jnp.asarray(
                rng.standard_normal((n, cfg.text_len, cfg.text_dim)).astype(np.float32)),
            "null_context": jnp.asarray(
                rng.standard_normal((n, cfg.text_len, cfg.text_dim)).astype(np.float32)),
        }
        state, info = distill_step(state, step_fn, teacher, batch, dcfg)
        assert np.isfinite(info["loss"])
