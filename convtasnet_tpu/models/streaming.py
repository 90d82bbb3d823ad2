"""Streaming (chunked, stateful) inference for causal Conv-TasNet.

The reference supports a causal configuration (cLN + left-pad/chomp convs,
conv_tasnet.py:176,:251-252) but only offline batch inference. Causality
makes true streaming possible: this module carries, across fixed-size
chunks,

  * the last L - S input samples (frame overlap at the chunk boundary),
  * per temporal block, a ring of the last (P-1)*dilation input frames
    (the causal conv's receptive tail),
  * the decoder's overlap-add tail (L - S samples),

so feeding a waveform chunk-by-chunk reproduces the offline forward
exactly (up to float associativity) with per-chunk latency. Requires
causal=True and stateless-per-frame norms (cLN); gLN normalizes over all
time and cannot stream.

The chunk step is one jitted function over static chunk length — compile
once, stream forever.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ConvTasNetConfig
from ..ops.activations import prelu
from ..ops.conv import pointwise
from ..ops.framing import frame_signal, overlap_and_add
from ..ops.norms import channelwise_layer_norm

StreamState = Dict[str, Any]


def _check(cfg: ConvTasNetConfig) -> None:
    if not cfg.causal:
        raise ValueError("streaming requires causal=True")
    if cfg.norm_type != "cLN":
        raise ValueError("streaming requires norm_type='cLN' (gLN needs "
                         "global time statistics; BN uses batch statistics)")


def init_stream_state(cfg: ConvTasNetConfig, batch: int = 1) -> StreamState:
    """Zero history: equivalent to the offline model's implicit zero padding."""
    _check(cfg)
    spans = [(cfg.P - 1) * 2**x for x in range(cfg.X)]
    return {
        # Unconsumed input samples (not yet coverable by a full frame).
        "sample_tail": jnp.zeros((batch, cfg.L - cfg.stride), jnp.float32),
        # Per (r, x) block: last span frames of the dwconv input, [R] list
        # of [X]-lists of [M, span, H].
        "conv_hist": [
            [jnp.zeros((batch, s, cfg.H), cfg.dtype) for s in spans]
            for _ in range(cfg.R)
        ],
        "ola_tail": jnp.zeros((batch, cfg.C, cfg.L - cfg.stride), jnp.float32),
    }


def _causal_dw_streaming(x, hist, w, dilation):
    """Causal depthwise conv with carried history.

    x: [M, Kc, H] current frames; hist: [M, span, H] previous frames.
    Returns (y [M, Kc, H], new_hist)."""
    P = w.shape[0]
    span = (P - 1) * dilation
    ext = jnp.concatenate([hist, x], axis=1)  # [M, span + Kc, H]
    Kc = x.shape[1]
    out = None
    for p in range(P):
        tap = ext[:, p * dilation : p * dilation + Kc, :] * w[p].astype(x.dtype)
        out = tap if out is None else out + tap
    new_hist = ext[:, ext.shape[1] - span :, :] if span > 0 else hist
    return out, new_hist


def stream_step(
    params,
    state: StreamState,
    cfg: ConvTasNetConfig,
    chunk: jnp.ndarray,
    first: bool = False,
) -> Tuple[jnp.ndarray, StreamState]:
    """Process one chunk: [M, T_chunk] -> ([M, C, K_c*S] samples, new_state).

    T_chunk must be a multiple of the encoder stride S = L//2. `first`
    marks the stream's first chunk, which frames the raw chunk with no
    carried samples (a zero-filled tail would fabricate a leading frame
    the offline forward does not have). The concatenated outputs of all
    chunks plus flush() match the offline forward sample-for-sample.
    """
    _check(cfg)
    dt = cfg.dtype
    S = cfg.stride
    M, Tc = chunk.shape
    if Tc % S != 0:
        raise ValueError(f"chunk length {Tc} must be a multiple of stride {S}")
    if first:
        buf = chunk
    else:
        buf = jnp.concatenate([state["sample_tail"], chunk], axis=1)
    frames = frame_signal(buf, cfg.L, S)  # [M, Kc, L]
    new_sample_tail = buf[:, buf.shape[1] - (cfg.L - S):]

    sp = params["separator"]
    w_mix = jnp.einsum(
        "mkl,ln->mkn", frames.astype(dt), params["encoder"]["U"].astype(dt),
        preferred_element_type=jnp.float32,
    )
    w_mix = jnp.maximum(w_mix, 0.0).astype(dt)

    x = channelwise_layer_norm(w_mix, sp["ln"]["gamma"], sp["ln"]["beta"])
    x = pointwise(x, sp["bottleneck"]["w"], dt).astype(dt)

    bp_all = sp["blocks"]
    new_hist = []
    for r in range(cfg.R):
        row = []
        for xi in range(cfg.X):
            bp = {k: v[r, xi] for k, v in bp_all.items()}
            res = x
            y = pointwise(x, bp["in_w"], dt).astype(dt)
            y = prelu(y, bp["in_prelu"])
            y = channelwise_layer_norm(y, bp["in_gamma"], bp["in_beta"])
            y, h = _causal_dw_streaming(
                y, state["conv_hist"][r][xi], bp["dw_w"], 2**xi
            )
            row.append(h)
            y = prelu(y, bp["dw_prelu"])
            y = channelwise_layer_norm(y, bp["dw_gamma"], bp["dw_beta"])
            y = pointwise(y, bp["out_w"], dt).astype(dt)
            x = res + y
        new_hist.append(row)

    score = pointwise(x, sp["mask"]["w"], dt)
    Kc = score.shape[1]
    score = score.reshape(M, Kc, cfg.C, cfg.N)
    if cfg.mask_nonlinear == "softmax":
        mask = jax.nn.softmax(score, axis=2)
    else:
        mask = jnp.maximum(score, 0.0)

    source_w = w_mix[:, :, None, :] * mask.astype(dt)
    est_frames = jnp.einsum(
        "mkcn,nl->mckl", source_w.astype(dt), params["decoder"]["V"].astype(dt),
        preferred_element_type=jnp.float32,
    )
    local = overlap_and_add(est_frames, S)  # [M, C, Kc*S + (L-S)]
    body = local[..., : Kc * S]
    tail = local[..., Kc * S :]
    body = body.at[..., : cfg.L - S].add(state["ola_tail"])

    new_state = {
        "sample_tail": new_sample_tail,
        "conv_hist": new_hist,
        "ola_tail": tail,
    }
    return body, new_state


class StreamingSeparator:
    """Stateful convenience wrapper; jits one chunk-step per chunk length.

    push() per chunk, then flush() for the final L-S overlap-add samples;
    the concatenation equals the offline forward on the whole waveform.
    """

    def __init__(self, cfg: ConvTasNetConfig, params, batch: int = 1):
        _check(cfg)
        self.cfg = cfg
        self.params = params
        self._batch = batch
        self.state = init_stream_state(cfg, batch)
        self._step = jax.jit(
            lambda p, s, c: stream_step(p, s, cfg, c, first=False)
        )
        self._step_first = jax.jit(
            lambda p, s, c: stream_step(p, s, cfg, c, first=True)
        )
        self._warm = 0

    def reset(self) -> None:
        """Reinitialize ALL mutable stream state for a fresh utterance
        (the jitted chunk steps are kept). Callers must use this rather
        than poking .state/._warm so future state additions can't be
        silently carried across utterances."""
        self.state = init_stream_state(self.cfg, batch=self._batch)
        self._warm = 0

    def push(self, chunk: jnp.ndarray) -> jnp.ndarray:
        """Feed [M, T_chunk] samples; returns the separated samples that
        became final ([M, C, T_chunk - S] for the first chunk, then
        [M, C, T_chunk])."""
        step = self._step_first if self._warm == 0 else self._step
        out, self.state = step(self.params, self.state, chunk)
        self._warm += 1
        return out

    def flush(self) -> jnp.ndarray:
        """Emit the final overlap-add tail ([M, C, L - S])."""
        return self.state["ola_tail"]
