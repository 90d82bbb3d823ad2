import numpy as np
import jax.numpy as jnp

from convtasnet_tpu.ops.framing import frame_signal, overlap_and_add, num_frames


def np_frame(x, L, S):
    K = (x.shape[-1] - L) // S + 1
    return np.stack([x[..., k * S : k * S + L] for k in range(K)], axis=-2)


def np_ola(frames, S):
    *lead, K, L = frames.shape
    out = np.zeros((*lead, (K - 1) * S + L), dtype=frames.dtype)
    for k in range(K):
        out[..., k * S : k * S + L] += frames[..., k, :]
    return out


def test_frame_matches_oracle_50pct(rng):
    x = rng.standard_normal((3, 64)).astype(np.float32)
    got = np.asarray(frame_signal(jnp.asarray(x), 8, 4))
    np.testing.assert_allclose(got, np_frame(x, 8, 4), rtol=1e-6)


def test_frame_matches_oracle_general_hop(rng):
    x = rng.standard_normal((2, 50)).astype(np.float32)
    got = np.asarray(frame_signal(jnp.asarray(x), 7, 3))
    np.testing.assert_allclose(got, np_frame(x, 7, 3), rtol=1e-6)


def test_frame_drops_partial_tail(rng):
    x = rng.standard_normal((41,)).astype(np.float32)
    got = np.asarray(frame_signal(jnp.asarray(x), 8, 4))
    assert got.shape == (num_frames(41, 8, 4), 8)
    np.testing.assert_allclose(got, np_frame(x, 8, 4), rtol=1e-6)


def test_ola_matches_oracle_50pct(rng):
    frames = rng.standard_normal((2, 3, 5, 8)).astype(np.float32)
    got = np.asarray(overlap_and_add(jnp.asarray(frames), 4))
    np.testing.assert_allclose(got, np_ola(frames, 4), rtol=1e-5, atol=1e-6)


def test_ola_matches_oracle_gcd_path(rng):
    # L % hop != 0 exercises the scatter fallback (reference utils.py:31-45).
    frames = rng.standard_normal((2, 4, 6)).astype(np.float32)
    got = np.asarray(overlap_and_add(jnp.asarray(frames), 4))
    np.testing.assert_allclose(got, np_ola(frames, 4), rtol=1e-5, atol=1e-6)


def test_frame_ola_roundtrip_interior(rng):
    # With 50% overlap and unit window, OLA(frame(x)) == 2x in the interior.
    x = rng.standard_normal((80,)).astype(np.float32)
    frames = frame_signal(jnp.asarray(x), 8, 4)
    y = np.asarray(overlap_and_add(frames, 4))
    np.testing.assert_allclose(y[4:-4], 2 * x[4 : y.shape[0] - 4], rtol=1e-5)
