"""Attention op tests: masking semantics, key-mask vs pair-bias
equivalence, pallas/xla parity (pallas runs on TPU only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_flows_tpu.models.blocks import key_mask_bias, pair_mask_bias
from multimodal_flows_tpu.ops.attention import _xla_attention, multihead_attention


def _qkv(B=4, H=2, T=10, Dh=8, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (B, H, T, Dh)) for k in ks)


def _mask(B=4, T=10, seed=1):
    n = jax.random.randint(jax.random.PRNGKey(seed), (B,), 2, T + 1)
    return (jnp.arange(T)[None, :] < n[:, None]).astype(jnp.int32)[..., None]


def test_key_mask_equals_pair_bias_on_real_rows():
    """Key-side masking must reproduce the pair-mask result for every real
    (non-pad) query row — pad rows are allowed to differ (discarded)."""
    q, k, v = _qkv()
    mask = _mask()
    out_pair = _xla_attention(q, k, v, pair_mask_bias(mask), None)
    out_key = _xla_attention(q, k, v, None, key_mask_bias(mask))
    real = np.asarray(mask[..., 0]) > 0
    np.testing.assert_allclose(np.asarray(out_pair).transpose(0, 2, 1, 3)[real],
                               np.asarray(out_key).transpose(0, 2, 1, 3)[real],
                               rtol=1e-5, atol=1e-6)


def test_pad_keys_never_attended():
    q, k, v = _qkv()
    mask = _mask()
    v_dirty = v.at[:, :, -1, :].set(1e6)  # poison the last key slot
    # jets where the last slot is padded must be unaffected by the poison
    km = key_mask_bias(mask)
    out_clean = _xla_attention(q, k, v, None, km)
    out_dirty = _xla_attention(q, k, v_dirty, None, km)
    pad_last = np.asarray(mask[:, -1, 0]) == 0
    np.testing.assert_allclose(np.asarray(out_clean)[pad_last],
                               np.asarray(out_dirty)[pad_last], rtol=1e-5)


def test_bias_composes_with_key_mask():
    q, k, v = _qkv()
    mask = _mask()
    bias = jax.random.normal(jax.random.PRNGKey(5), (4, 1, 10, 10))
    out = _xla_attention(q, k, v, bias, key_mask_bias(mask))
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="pallas kernel is TPU-only")
def test_pallas_matches_xla():
    from multimodal_flows_tpu.ops.pallas_attention import pallas_set_attention

    q, k, v = _qkv(B=8, H=4, T=150, Dh=64)
    mask = _mask(B=8, T=150)
    km = key_mask_bias(mask)
    ref = _xla_attention(q, k, v, None, km)
    out = pallas_set_attention(q, k, v, km)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)
