import numpy as np
import jax.numpy as jnp

from convtasnet_tpu.config import EPS
from convtasnet_tpu.ops.loss import cal_loss, reorder_source, si_snr_with_pit


def np_si_snr_pair(est, src):
    """Plain-numpy oracle of the projection SI-SNR between two 1-D signals
    (already zero-meaned/masked), per pit_criterion.py:54-62."""
    dot = np.sum(est * src)
    energy = np.sum(src**2) + EPS
    proj = dot * src / energy
    noise = est - proj
    return 10 * np.log10(np.sum(proj**2) / (np.sum(noise**2) + EPS) + EPS)


def np_upit(source, estimate, lengths):
    """Brute-force oracle: try every permutation explicitly."""
    from itertools import permutations

    B, C, T = source.shape
    max_snrs, perms_out = [], []
    for b in range(B):
        n = lengths[b]
        mask = np.zeros(T, np.float32)
        mask[:n] = 1
        est = estimate[b] * mask
        src = source[b]
        zm_src = (src - src.sum(-1, keepdims=True) / n) * mask
        zm_est = (est - est.sum(-1, keepdims=True) / n) * mask
        best, best_p = -np.inf, None
        for p in permutations(range(C)):
            s = sum(np_si_snr_pair(zm_est[i], zm_src[p[i]]) for i in range(C))
            if s > best:
                best, best_p = s, p
        max_snrs.append(best / C)
        perms_out.append(best_p)
    return np.array(max_snrs), np.array(perms_out)


def test_upit_matches_bruteforce_c2(rng):
    B, C, T = 4, 2, 64
    src = rng.standard_normal((B, C, T)).astype(np.float32)
    est = rng.standard_normal((B, C, T)).astype(np.float32)
    lengths = np.array([64, 50, 64, 33])
    for b in range(B):
        src[b, :, lengths[b]:] = 0
    max_snr, perm, _ = si_snr_with_pit(jnp.asarray(src), jnp.asarray(est), jnp.asarray(lengths))
    want_snr, want_perm = np_upit(src, est, lengths)
    np.testing.assert_allclose(np.asarray(max_snr), want_snr, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(perm), want_perm)


def test_upit_matches_bruteforce_c3(rng):
    B, C, T = 3, 3, 48
    src = rng.standard_normal((B, C, T)).astype(np.float32)
    est = rng.standard_normal((B, C, T)).astype(np.float32)
    lengths = np.array([48, 40, 25])
    for b in range(B):
        src[b, :, lengths[b]:] = 0
    max_snr, _, _ = si_snr_with_pit(jnp.asarray(src), jnp.asarray(est), jnp.asarray(lengths))
    want_snr, _ = np_upit(src, est, lengths)
    np.testing.assert_allclose(np.asarray(max_snr), want_snr, rtol=1e-4)


def test_loss_is_neg_mean_over_batch(rng):
    B, C, T = 5, 2, 32
    src = rng.standard_normal((B, C, T)).astype(np.float32)
    est = rng.standard_normal((B, C, T)).astype(np.float32)
    lengths = np.full(B, T)
    loss, max_snr, _, _ = cal_loss(jnp.asarray(src), jnp.asarray(est), jnp.asarray(lengths))
    np.testing.assert_allclose(float(loss), -np.asarray(max_snr).mean(), rtol=1e-6)


def test_perfect_separation_recovers_identity_perm(rng):
    B, C, T = 2, 2, 128
    src = rng.standard_normal((B, C, T)).astype(np.float32)
    # Estimates are scaled + slightly noisy swapped sources.
    est = src[:, ::-1, :] * 2.5 + 0.001 * rng.standard_normal((B, C, T)).astype(np.float32)
    lengths = np.full(B, T)
    max_snr, perm, _ = si_snr_with_pit(jnp.asarray(src), jnp.asarray(est), jnp.asarray(lengths))
    # SI-SNR is scale-invariant -> very high SNR under the swap permutation.
    assert float(max_snr.min()) > 40.0
    np.testing.assert_array_equal(np.asarray(perm), np.array([[1, 0], [1, 0]]))


def test_reorder_source_applies_perm(rng):
    src = rng.standard_normal((2, 3, 8)).astype(np.float32)
    perm = np.array([[2, 0, 1], [0, 2, 1]])
    got = np.asarray(reorder_source(jnp.asarray(src), jnp.asarray(perm)))
    for b in range(2):
        for c in range(3):
            np.testing.assert_allclose(got[b, c], src[b, perm[b, c]])


def test_padding_invariance(rng):
    # Extending T with zeros beyond every length must not change the loss.
    B, C, T = 3, 2, 40
    src = rng.standard_normal((B, C, T)).astype(np.float32)
    est = rng.standard_normal((B, C, T)).astype(np.float32)
    lengths = np.array([40, 30, 22])
    for b in range(B):
        src[b, :, lengths[b]:] = 0
    loss1, *_ = cal_loss(jnp.asarray(src), jnp.asarray(est), jnp.asarray(lengths))
    pad = ((0, 0), (0, 0), (0, 16))
    loss2, *_ = cal_loss(
        jnp.asarray(np.pad(src, pad)), jnp.asarray(np.pad(est, pad)), jnp.asarray(lengths)
    )
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)


def test_gram_matches_direct():
    """The single-pass Gram form of the pairwise SI-SNR table equals the
    reference-order direct form (ops/loss.py _pair_snr_gram/_direct)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(42)
    for B, C, T in [(3, 2, 4000), (2, 3, 2500)]:
        src = rng.normal(size=(B, C, T)).astype(np.float32)
        est = src + 0.5 * rng.normal(size=(B, C, T)).astype(np.float32)
        lengths = np.full(B, T, np.int32)
        lengths[-1] = T - 700
        src[-1, :, T - 700:] = 0.0
        lg, pg, _ = si_snr_with_pit(jnp.asarray(src), jnp.asarray(est),
                                    jnp.asarray(lengths), method="gram")
        ld, pd, _ = si_snr_with_pit(jnp.asarray(src), jnp.asarray(est),
                                    jnp.asarray(lengths), method="direct")
        np.testing.assert_allclose(np.asarray(lg), np.asarray(ld), rtol=2e-4)
        np.testing.assert_array_equal(np.asarray(pg), np.asarray(pd))


def test_gram_high_snr_stable():
    """Near-perfect estimates (cancellation-prone for the Gram form) must
    stay finite and ordered correctly."""
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    src = rng.normal(size=(2, 2, 3000)).astype(np.float32)
    est = src + 1e-3 * rng.normal(size=(2, 2, 3000)).astype(np.float32)
    lengths = np.full(2, 3000, np.int32)
    snr, perm, _ = si_snr_with_pit(jnp.asarray(src), jnp.asarray(est),
                                   jnp.asarray(lengths), method="gram")
    assert np.all(np.isfinite(np.asarray(snr)))
    assert np.all(np.asarray(snr) > 40.0)
    np.testing.assert_array_equal(np.asarray(perm), [[0, 1], [0, 1]])


def test_source_padding_masked():
    """The loss must mask the TARGETS too (pit_criterion.py:37-48): garbage
    in source beyond lengths must not change loss, perm, or reorder."""
    import jax.numpy as jnp
    rng = np.random.default_rng(11)
    B, C, T = 3, 2, 900
    src = rng.normal(size=(B, C, T)).astype(np.float32)
    est = rng.normal(size=(B, C, T)).astype(np.float32)
    lengths = np.array([900, 640, 512], np.int32)
    for b in range(B):
        src[b, :, lengths[b]:] = 0
    loss0, snr0, _, re0 = cal_loss(jnp.asarray(src), jnp.asarray(est),
                                   jnp.asarray(lengths))
    dirty = src.copy()
    for b in range(B):
        dirty[b, :, lengths[b]:] = 37.0  # non-zero padding
    loss1, snr1, _, re1 = cal_loss(jnp.asarray(dirty), jnp.asarray(est),
                                   jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(loss0), np.asarray(loss1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(snr0), np.asarray(snr1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(re0), np.asarray(re1), rtol=1e-6)


def test_zero_length_rows_excluded():
    """Zero-length rows are batch padding (parallel/mesh.py pads batches to
    the data-axis multiple): they must be finite, carry zero weight in the
    loss, and contribute zero gradient — so padded and unpadded batches
    produce identical loss AND grads."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(5)
    B, C, T = 3, 2, 640
    src = rng.normal(size=(B, C, T)).astype(np.float32)
    est = rng.normal(size=(B, C, T)).astype(np.float32)
    lengths = np.array([640, 500, 640], np.int32)

    loss_real = cal_loss(jnp.asarray(src), jnp.asarray(est),
                         jnp.asarray(lengths))[0]

    pad = 5
    src_p = np.concatenate([src, np.zeros((pad, C, T), np.float32)])
    # padded-row estimates are arbitrary garbage: weight-0 must kill them
    est_p = np.concatenate(
        [est, rng.normal(size=(pad, C, T)).astype(np.float32)])
    lengths_p = np.concatenate([lengths, np.zeros(pad, np.int32)])

    loss_pad = cal_loss(jnp.asarray(src_p), jnp.asarray(est_p),
                        jnp.asarray(lengths_p))[0]
    assert np.isfinite(float(loss_pad))
    np.testing.assert_allclose(float(loss_pad), float(loss_real), rtol=1e-6)

    g_real = jax.grad(
        lambda e: cal_loss(jnp.asarray(src), e, jnp.asarray(lengths))[0]
    )(jnp.asarray(est))
    g_pad = jax.grad(
        lambda e: cal_loss(jnp.asarray(src_p), e, jnp.asarray(lengths_p))[0]
    )(jnp.asarray(est_p))
    assert np.all(np.isfinite(np.asarray(g_pad)))
    np.testing.assert_allclose(np.asarray(g_pad[:B]), np.asarray(g_real),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(g_pad[B:]), 0.0)
