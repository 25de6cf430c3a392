"""Fake-checkpoint parity through the PUBLIC ``Zonos.generate`` path
(VERDICT r2 task #7).

tests/test_fake_checkpoint_parity.py proves the raw prefill/step functions
match a torch oracle; here the SAME fake checkpoints drive the production
decode program — ``Zonos.generate`` with its jitted ``lax.while_loop``, EOS
choreography, cache growth, and int8 serving weights — against an
imperative numpy/torch oracle of the reference's generate loop
(zonos/model.py:224-451: logit bias, first-EOS resample, 6-step silence
window, staircase EOS placement, delay revert, per-sample EOS trim).

Covered configurations:
- greedy + cache_growth=True (bit-identical contract, docs/PERFORMANCE.md);
- int8 serving weights constructed ON the quantization grid (every value a
  multiple of a power-of-two per-channel scale with absmax = 127*s), so
  ``quantize_int8`` is lossless and the fp32 oracle stays the ground truth
  — a dequant-aware comparison with zero tolerance on the codes;
- hybrid backbone through the same public path;
- a forced-EOS case: the cb0 EOS head row is solved (least squares on the
  recorded CFG-blended hidden states) to make sample 0 — and only sample
  0 — hit EOS mid-generation, exercising resample-once, the silence
  window, and the staircase against the oracle end to end.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests.test_fake_checkpoint_parity import (  # noqa: E402
    CFG_SCALE,
    _fake_sd_hybrid,
    _fake_sd_transformer,
    _oracle_hybrid_hidden,
    _oracle_transformer_hidden,
    _ref_delay,
    _tiny_hybrid_cfg,
    _tiny_transformer_cfg,
)
from zonos_tpu.config import ZonosConfig  # noqa: E402

MAX_NEW = 24
LOG1024 = float(np.log(1024.0))


# ---------------------------------------------------------------------------
# Oracle: the reference's public generate loop, greedy, imperative numpy
# ---------------------------------------------------------------------------


def _bf16_round(x: np.ndarray) -> np.ndarray:
    return np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)


def _oracle_generate(sd: dict, cfg: ZonosConfig, prefix_2b: np.ndarray, hidden_fn,
                     max_new_tokens: int, record: dict | None = None):
    """Greedy reference-semantics generate (zonos/model.py:224-451).

    Stateless oracle: every step recomputes the full sequence through
    ``hidden_fn`` (no KV cache to get wrong).  ``record`` (optional dict)
    captures per-step CFG-blended hidden vectors and non-EOS logit maxima
    for the forced-EOS head construction.  Returns the reference output
    contract: a list of per-sample EOS-trimmed [K, T_i] code arrays.
    """
    K, eos_id, mask_id = cfg.num_codebooks, cfg.eos_token_id, cfg.masked_token_id
    B = prefix_2b.shape[0] // 2
    emb = [np.asarray(sd[f"embeddings.{k}.weight"], np.float32) for k in range(K)]
    heads = [np.asarray(sd[f"heads.{k}.weight"], np.float32) for k in range(K)]

    delayed = _ref_delay(np.full((B, K, max_new_tokens), -1, np.int64), mask_id)

    def embed(ids):  # [B, K, S] -> [B, S, d] (fp32 throughout: the public
        # path under fp32-loaded params runs fp32 end to end — compute_dtype)
        return sum(emb[k][ids[:, k]] for k in range(K))

    def blended_hidden(offset):
        x_audio = embed(delayed[..., :offset])
        x = np.concatenate([prefix_2b, np.tile(x_audio, (2, 1, 1))], axis=1)
        hidden = hidden_fn(sd, cfg, torch.tensor(np.asarray(x, np.float32))).numpy()[:, -1]
        return hidden[B:] + (hidden[:B] - hidden[B:]) * CFG_SCALE  # [B, d]

    def logits_of(bh):  # blended hidden [B, d] -> [B, K, 1025]
        return np.stack([bh @ h.T for h in heads], axis=1)

    # ---- prefill + first frame (no logit bias — zonos/model.py:298-314) ---
    bh0 = blended_hidden(1)
    if record is not None:
        l0 = logits_of(bh0)
        record["bh0"] = bh0
        record["maxother0"] = np.max(
            np.where(np.arange(l0.shape[-1]) == eos_id, -np.inf, l0[:, 0]), axis=-1)
    frame0 = np.argmax(logits_of(bh0), axis=-1)
    cur = delayed[..., 1]
    delayed[..., 1] = np.where(cur == -1, frame0, cur)
    offset = 1

    # ---- decode loop (zonos/model.py:321-432) -----------------------------
    max_steps = delayed.shape[2] - 1
    remaining = np.full((B,), max_steps, np.int64)
    stopping = np.zeros((B,), bool)
    eos_mode = np.zeros((B,), bool)
    steps_after_eos = np.full((B,), 6, np.int64)

    step = 0
    while remaining.max() > 0:
        offset += 1
        logits = logits_of(blended_hidden(offset))
        logits[:, 1:, eos_id] = -np.inf
        logits[:, 0, eos_id] -= LOG1024

        eos_active = eos_mode & (steps_after_eos > 0)
        logits[eos_active, 0, eos_id] = -np.inf
        steps_after_eos[eos_active] -= 1

        if record is not None:
            record.setdefault("bh", []).append(blended_hidden(offset))
            record.setdefault("maxother", []).append(
                np.max(np.where(np.arange(logits.shape[-1]) == eos_id, -np.inf,
                                logits[:, 0]), axis=-1))

        token = np.argmax(logits, axis=-1)  # [B, K]

        new_eos = (token[:, 0] == eos_id) & (~eos_mode)
        if new_eos.any():
            eos_mode |= new_eos
            steps_after_eos[new_eos] = 6
            logits[new_eos, 0, eos_id] = -np.inf
            token = np.argmax(logits, axis=-1)  # resample once, EOS banned

        eos_in_cb0 = token[:, 0] == eos_id
        remaining[eos_in_cb0] = np.minimum(remaining[eos_in_cb0], K)
        stopping |= eos_in_cb0

        idx = np.clip(K - remaining, 0, K - 1)
        for i in range(B):
            if stopping[i]:
                token[i, : idx[i]] = mask_id
                token[i, idx[i]] = eos_id

        if offset < delayed.shape[2]:  # final-step write is a no-op slice in
            cur = delayed[..., offset]  # the reference (torch clamps); ours
            delayed[..., offset] = np.where(cur == -1, token, cur)  # merges
        remaining -= 1
        step += 1

    # ---- post-processing (zonos/model.py:437-451) -------------------------
    out = np.stack(
        [delayed[:, k, k + 1 : delayed.shape[2] - K + k + 1] for k in range(K)], axis=1)
    eos_pos = (out[:, 0, :] == eos_id).argmax(axis=1)
    eos_pos[eos_pos == 0] = out.shape[2]
    out = out[..., : offset - K]
    out = np.where(out >= 1024, 0, out)
    return [out[i, :, : min(eos_pos[i], out.shape[2])].copy() for i in range(B)]


# ---------------------------------------------------------------------------
# Harness
# ---------------------------------------------------------------------------


def _load_model(cfg, sd, tmp_path, quant: str | None = None):
    from safetensors.numpy import save_file

    from zonos_tpu.models.tts import Zonos
    from zonos_tpu.utils.checkpoint import load_zonos_checkpoint

    path = str(tmp_path / "model.safetensors")
    save_file(sd, path)
    model = Zonos(cfg)
    model.params = load_zonos_checkpoint(cfg, path, dtype=jnp.float32)
    if quant == "int8":
        model.quantize_int8()
    return model


def _prefix_2b(cfg, model) -> np.ndarray:
    """Conditioning prefix through OUR conditioner (already oracle-verified
    in test_fake_checkpoint_parity), bf16-rounded as the public path does."""
    from zonos_tpu.conditioning import make_cond_dict

    speaker = np.random.default_rng(7).normal(size=(1, 1, 128)).astype(np.float32)
    cond = make_cond_dict(text=["hello world", "testing one two"], language="en-us",
                          speaker=speaker, unconditional_keys=frozenset())
    return _bf16_round(np.asarray(model.prepare_conditioning(cond), np.float32))


def _run_public(model, prefix_2b, cache_growth=None):
    from zonos_tpu.ops.sampling import SamplingParams

    return model.generate(
        jnp.asarray(prefix_2b), max_new_tokens=MAX_NEW, cfg_scale=CFG_SCALE,
        batch_size=2, sampling_params=SamplingParams.greedy(), seed=11,
        progress_bar=False, cache_growth=cache_growth,
    )


def _assert_same(got: list, want: list):
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_array_equal(g, w, err_msg=f"sample {i}")


def test_public_generate_transformer_matches_oracle(tmp_path):
    cfg = _tiny_transformer_cfg()
    sd = _fake_sd_transformer(cfg)
    model = _load_model(cfg, sd, tmp_path)
    prefix = _prefix_2b(cfg, model)
    want = _oracle_generate(sd, cfg, prefix, _oracle_transformer_hidden, MAX_NEW)
    got = _run_public(model, prefix, cache_growth=True)
    _assert_same(got, want)


def _on_grid(rng, out_dim: int, in_dim: int, s: float = 2.0 ** -9) -> np.ndarray:
    """torch-layout [out, in] weight exactly representable under per-channel
    symmetric int8 (scale = absmax/127 = s, a power of two => exact in the
    bf16 scale store; every entry q*s with |q| <= 127)."""
    w = rng.integers(-127, 128, size=(out_dim, in_dim)).astype(np.float32) * s
    w[:, 0] = 127.0 * s * np.sign(rng.standard_normal(out_dim) + 0.01)
    return w


def test_public_generate_int8_matches_oracle(tmp_path):
    """int8 serving weights on the quantization grid: quantize_int8 is then
    lossless, so the public int8 decode must reproduce the fp32 oracle's
    codes exactly — any scale/transpose/routing bug in the quantized matmul
    path shows up as a code mismatch."""
    cfg = _tiny_transformer_cfg()
    bb = cfg.backbone
    rng = np.random.default_rng(21)
    sd = _fake_sd_transformer(cfg)
    d, H, Hkv, hd = bb.d_model, bb.num_heads, bb.num_heads_kv, bb.head_dim
    inter = bb.attn_mlp_d_intermediate
    for i in range(bb.n_layer):
        p = f"backbone.layers.{i}."
        sd[p + "mixer.in_proj.weight"] = _on_grid(rng, (H + 2 * Hkv) * hd, d)
        sd[p + "mixer.out_proj.weight"] = _on_grid(rng, d, H * hd) * 0.25
        sd[p + "mlp.fc1.weight"] = _on_grid(rng, 2 * inter, d)
        sd[p + "mlp.fc2.weight"] = _on_grid(rng, d, inter) * 0.25
    for k in range(9):
        sd[f"heads.{k}.weight"] = _on_grid(rng, 1025, d)

    model = _load_model(cfg, sd, tmp_path, quant="int8")
    prefix = _prefix_2b(cfg, model)
    want = _oracle_generate(sd, cfg, prefix, _oracle_transformer_hidden, MAX_NEW)
    got = _run_public(model, prefix)
    _assert_same(got, want)


def test_public_generate_hybrid_matches_oracle(tmp_path):
    cfg = _tiny_hybrid_cfg()
    sd = _fake_sd_hybrid(cfg)
    model = _load_model(cfg, sd, tmp_path)
    prefix = _prefix_2b(cfg, model)
    want = _oracle_generate(sd, cfg, prefix, _oracle_hybrid_hidden, MAX_NEW)
    got = _run_public(model, prefix)
    _assert_same(got, want)


def test_forced_eos_staircase_through_public_generate(tmp_path):
    """Solve the cb0 EOS head row so sample 0 triggers EOS at loop step 4
    (resampled away, opening the 6-step silence window) and again at step 11
    (entering the staircase), while sample 1 never triggers — then assert the
    public generate's output equals the oracle's, including the early trim of
    sample 0.  This oracle-checks the reference EOS choreography
    (zonos/model.py:336-414) through the production program, not a unit sim."""
    cfg = _tiny_transformer_cfg()
    eos_id = cfg.eos_token_id
    sd = _fake_sd_transformer(cfg)
    model = _load_model(cfg, sd, tmp_path)
    prefix = _prefix_2b(cfg, model)

    # base run records blended hiddens + per-step non-EOS logit maxima
    rec: dict = {}
    base = _oracle_generate(sd, cfg, prefix, _oracle_transformer_hidden, MAX_NEW, record=rec)
    assert all(o.shape[1] == base[0].shape[1] for o in base), "base run must not EOS"
    bh = np.stack(rec["bh"])          # [S, B, d]
    mo = np.stack(rec["maxother"])    # [S, B]
    S = bh.shape[0]
    t_star, t_again = 4, 11           # t_again = t_star + 7 (window drained)
    assert t_again < S - cfg.num_codebooks - 2

    rows, targets = [], []
    for t in (t_star, t_again):
        rows.append(bh[t, 0])
        targets.append(mo[t, 0] + LOG1024 + 6.0)   # EOS wins by ~6 logits
    for b in range(2):                              # the UNBIASED prefill
        rows.append(rec["bh0"][b])                  # frame must not trigger
        targets.append(rec["maxother0"][b] - 6.0)
    for t in range(S):
        if t < t_star:                              # sample 0 quiet before t*
            rows.append(bh[t, 0])
            targets.append(mo[t, 0] + LOG1024 - 6.0)
        rows.append(bh[t, 1])                       # sample 1 never triggers
        targets.append(mo[t, 1] + LOG1024 - 6.0)
    w_eos, *_ = np.linalg.lstsq(np.stack(rows), np.asarray(targets), rcond=None)
    resid = np.stack(rows) @ w_eos - np.asarray(targets)
    assert np.abs(resid).max() < 1.0, "EOS head solve did not fit"

    sd2 = dict(sd)
    h0 = np.array(sd["heads.0.weight"], np.float32, copy=True)
    h0[eos_id] = w_eos.astype(np.float32)
    sd2["heads.0.weight"] = h0

    want = _oracle_generate(sd2, cfg, prefix, _oracle_transformer_hidden, MAX_NEW)
    # the construction must actually shorten sample 0 (staircase engaged)
    assert want[0].shape[1] < want[1].shape[1]

    model2 = _load_model(cfg, sd2, tmp_path)
    got = _run_public(model2, prefix)
    _assert_same(got, want)
