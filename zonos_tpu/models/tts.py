"""Zonos TTS orchestration: conditioning -> prefill -> AR decode -> codes.

Capability parity with the reference orchestrator (zonos/model.py:22-457):
9-codebook token embedding (summed), multi-head logits, classifier-free
guidance, delay-pattern decode with the same EOS choreography (resample once
on first EOS, 6-step post-EOS silence window, staircase EOS placement as the
delay drains), per-sample repetition penalty disabled in EOS mode, and the
same output trimming semantics.

TPU-first design (explicitly NOT a port):

- The entire generation — prefill + every decode step + sampling + EOS
  bookkeeping — is ONE jitted program; the token loop is a
  ``lax.while_loop`` whose carry (codes, KV cache, offsets, EOS state, PRNG
  key) lives on device.  The reference syncs to host twice per token
  (``.item()`` at model.py:412 and the loop condition at model.py:345);
  here there are zero per-token host round trips.
- The reference's data-dependent Python (EOS resampling branch at
  model.py:376-395, the staircase placement loop at model.py:410-414) is
  expressed as vectorized masked selects, so the compiled step is identical
  every iteration — XLA's equivalent of the CUDA-Graph replay the reference
  needs (model.py:144-179).
- All 9 output heads are one fused ``[d, 9*V_pad]`` matmul; all 9 input
  embeddings are one stacked gather — MXU-shaped, not 9 small ops.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from zonos_tpu.config import ZonosConfig
from zonos_tpu.conditioning import (
    build_specs,
    init_prefix_conditioner_params,
    prefix_conditioner_forward,
    prepare_cond_inputs,
    required_keys,
)
from zonos_tpu.models.backbone import (
    KVCache,
    init_transformer_params,
    transformer_decode_step,
    transformer_prefill,
)
from zonos_tpu.ops.delay import apply_delay_pattern, revert_delay_pattern
from zonos_tpu.ops.sampling import SamplingParams, sample_from_logits

logger = logging.getLogger("zonos_tpu.model")

UNKNOWN_TOKEN = -1
MAX_STEPS_AFTER_EOS = 6  # ~70 ms of silence after EOS (ref: zonos/model.py:336)


# ---------------------------------------------------------------------------
# Embeddings / heads
# ---------------------------------------------------------------------------


def init_embed_head_params(key, cfg: ZonosConfig, dtype=jnp.bfloat16) -> dict:
    d = cfg.backbone.d_model
    K, Vp = cfg.num_codebooks, cfg.padded_vocab_size
    k1, k2 = jax.random.split(key)
    emb = jax.random.normal(k1, (K, Vp, d), jnp.float32) * 0.02
    heads = jax.random.normal(k2, (d, K * Vp), jnp.float32) / np.sqrt(d)
    # Zero the TPU-lane vocab padding (rows >= 1026 / head cols >= 1025 per
    # codebook): those weights are dead (ids never reach them; padded logits
    # are masked to -inf), and zeroing makes init match checkpoint loads
    # bit-for-bit (the loader zero-pads), so export -> reload round-trips.
    emb = emb.at[:, cfg.input_vocab_size:, :].set(0.0)
    cols = jnp.arange(K * Vp) % Vp >= cfg.output_vocab_size
    heads = jnp.where(cols[None, :], 0.0, heads)
    return {"embeddings": emb.astype(dtype), "heads": heads.astype(dtype)}


def embed_codes(params: dict, codes: jnp.ndarray) -> jnp.ndarray:
    """Sum the 9 per-codebook embeddings: codes [B, K, S] -> [B, S, d]
    (ref: zonos/model.py:97-98, as one stacked gather)."""
    K = codes.shape[1]
    tables = params["embeddings"]  # [K, Vp, d]
    gathered = tables[jnp.arange(K)[None, :, None], codes]  # [B, K, S, d]
    return jnp.sum(gathered, axis=1)


def apply_heads(params: dict, cfg: ZonosConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    """hidden [B, d] -> logits [B, K, V_pad] via one fused matmul
    (ref: zonos/model.py:100-101 runs 9 separate Linears)."""
    from zonos_tpu.models.backbone import matmul_w

    K, Vp = cfg.num_codebooks, cfg.padded_vocab_size
    logits = matmul_w(hidden, params["heads"])  # [B, K*Vp]
    return logits.reshape(hidden.shape[0], K, Vp).astype(jnp.float32)


def cfg_blend(logits: jnp.ndarray, cfg_scale: jnp.ndarray) -> jnp.ndarray:
    """Classifier-free guidance over a [2B, ...] cond/uncond stack
    (ref: zonos/model.py:112-114)."""
    B = logits.shape[0] // 2
    cond, uncond = logits[:B], logits[B:]
    return uncond + (cond - uncond) * cfg_scale


def _mask_invalid(logits: jnp.ndarray, output_vocab: int) -> jnp.ndarray:
    """-inf above the real output vocab (EOS=1024 is the last valid id;
    ref: zonos/model.py:115)."""
    V = logits.shape[-1]
    return jnp.where(jnp.arange(V) >= output_vocab, -jnp.inf, logits)


# ---------------------------------------------------------------------------
# The jitted generation program
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class GenerateStatics:
    """Shape-defining (compile-time) arguments of one generation program.

    ``use_cfg=False`` builds the program WITHOUT the classifier-free-
    guidance row doubling: at cfg_scale == 1.0 the blend
    ``uncond + (cond-uncond)*1`` is just ``cond``, so the uncond half — half
    of every matmul, KV cache and SSM state — can be dropped statically.
    ``Zonos.generate`` selects this automatically when the caller passes
    ``cfg_scale=1.0``."""

    batch_size: int
    cond_len: int
    prefix_audio_len: int
    max_new_tokens: int
    sampling: SamplingParams
    use_cfg: bool = True


def _compute_step_logits(model_params, cfg, hidden_2b, cfg_scale, use_cfg=True):
    logits = apply_heads(model_params, cfg, hidden_2b)
    if use_cfg:
        logits = cfg_blend(logits, cfg_scale)
    return _mask_invalid(logits, cfg.output_vocab_size)


def build_generate_parts(cfg: ZonosConfig, statics: GenerateStatics,
                         decode_step_fn=None, prefill_fn=None, cache_fn=None,
                         cache_len: int | None = None):
    """Construct the two jittable halves of the generation program:

    - ``init(params, prefix_cond, prefix_codes, cfg_scale, key) -> state``:
      prefill + first-frame sample.
    - ``loop(params, state, cfg_scale, chunk_steps) -> state``: run the
      decode ``while_loop`` for up to ``chunk_steps`` more tokens
      (``chunk_steps`` is traced, so one compilation serves every chunk
      size — used for progress/callback chunking without recompiles).

    The fused full-speed path runs ``loop`` once with a huge chunk.
    """
    st = statics
    K = cfg.num_codebooks
    eos_id, mask_id = cfg.eos_token_id, cfg.masked_token_id
    B = st.batch_size
    audio_len = st.prefix_audio_len + st.max_new_tokens
    # KV cache length rounded to a TPU-friendly tile (validity is masked);
    # the reference rounds to %8 for torch (zonos/model.py:204-208).
    from zonos_tpu.config import find_multiple

    total_seq = find_multiple(st.cond_len + audio_len + K, 64)
    initial_cache_len = min(cache_len, total_seq) if cache_len else total_seq
    window = max(st.sampling.repetition_penalty_window, 1)
    decode_step_fn = decode_step_fn or transformer_decode_step
    prefill_fn = prefill_fn or transformer_prefill
    cache_fn = cache_fn or (lambda batch, seqlen: KVCache.create(cfg.backbone, batch, seqlen))

    prefill_len = st.prefix_audio_len + 1
    max_steps_total = st.max_new_tokens + K - 1

    def init(model_params, prefix_cond, prefix_codes, cfg_scale, key, step_limit=None):
        """prefix_cond [2B, cond_len, d]; prefix_codes [B, K, prefix_audio_len].

        ``key``: a [B] batch of PRNG keys — each sample draws every token
        from its OWN stream, so a row's audio is independent of which peers
        share its device batch (the serving batcher co-batches requests with
        different seeds).  A scalar key is accepted and fanned out per row
        (``fold_in(key, row)``) for ad-hoc callers.

        ``step_limit`` (optional, traced): per-sample cap on new frames
        ([B] or scalar int32).  The program is compiled for
        ``statics.max_new_tokens``; shorter requests pass their duration
        here instead of recompiling — and samples with different durations
        can share one device batch (serving/batching.py)."""
        backbone_params = model_params["backbone"]
        if key.ndim == 0:
            key = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(B))
        cache = cache_fn((2 if st.use_cfg else 1) * B, initial_cache_len)

        codes = jnp.full((B, K, audio_len), UNKNOWN_TOKEN, jnp.int32)
        if st.prefix_audio_len > 0:
            codes = codes.at[..., : st.prefix_audio_len].set(prefix_codes)
        delayed = apply_delay_pattern(codes, mask_id)  # [B, K, audio_len + K]

        # ---- prefill over text prefix + delayed audio prefix -------------
        audio_embeds = embed_codes(model_params, delayed[..., :prefill_len])
        if st.use_cfg:
            audio_embeds = jnp.tile(audio_embeds, (2, 1, 1))
        x = jnp.concatenate([prefix_cond, audio_embeds.astype(prefix_cond.dtype)], axis=1)
        hidden, cache = prefill_fn(cfg.backbone, backbone_params, x, cache)
        logits = _compute_step_logits(model_params, cfg, hidden[:, -1], cfg_scale, st.use_cfg)
        if st.sampling.ban_eos:
            # fixed-length mode (benchmarks): EOS can never be sampled, so
            # every sample runs exactly its step budget (trace-time gate)
            logits = logits.at[:, :, eos_id].set(-jnp.inf)

        ks = jax.vmap(lambda k: jax.random.split(k))(key)  # [B, 2] keys
        key, sub = ks[:, 0], ks[:, 1]
        first_token = sample_from_logits(sub, logits, st.sampling).astype(jnp.int32)

        offset = jnp.int32(prefill_len)
        frame = jax.lax.dynamic_slice_in_dim(delayed, offset, 1, axis=2)
        merged = jnp.where(frame == UNKNOWN_TOKEN, first_token[..., None], frame)
        delayed = jax.lax.dynamic_update_slice_in_dim(delayed, merged, offset, axis=2)

        pos = jnp.int32(st.cond_len + prefill_len)  # next cache write position

        max_steps = delayed.shape[2] - prefill_len
        remaining = jnp.full((B,), max_steps, jnp.int32)
        if step_limit is not None:
            lim = jnp.broadcast_to(jnp.asarray(step_limit, jnp.int32), (B,))
            remaining = jnp.minimum(remaining, lim + (K - 1))

        return dict(
            delayed=delayed,
            cache=cache,
            offset=offset,
            pos=pos,
            remaining=remaining,
            stopping=jnp.zeros((B,), bool),
            eos_mode=jnp.zeros((B,), bool),
            steps_after_eos=jnp.full((B,), MAX_STEPS_AFTER_EOS, jnp.int32),
            key=key,
        )

    def loop(model_params, state, cfg_scale, chunk_steps):
        backbone_params = model_params["backbone"]

        # EOS down-weighting bias (ref: zonos/model.py:322-324); with
        # ban_eos the codebook-0 EOS is -inf too (fixed-length mode)
        Vp = cfg.padded_vocab_size
        bias = jnp.zeros((K, Vp), jnp.float32)
        bias = bias.at[1:, eos_id].set(-jnp.inf)
        if st.sampling.ban_eos:
            bias = bias.at[0, eos_id].set(-jnp.inf)
        else:
            bias = bias.at[0, eos_id].add(-jnp.log(1024.0))

        chunk_end = state["offset"] + chunk_steps

        def cond_fn(s):
            return (jnp.max(s["remaining"]) > 0) & (s["offset"] < chunk_end)

        def body_fn(s):
            offset = s["offset"] + 1
            input_ids = jax.lax.dynamic_slice_in_dim(s["delayed"], offset - 1, 1, axis=2)
            h = embed_codes(model_params, input_ids)
            h2 = jnp.tile(h, (2, 1, 1)) if st.use_cfg else h
            hidden, cache = decode_step_fn(cfg.backbone, backbone_params, h2, s["cache"], s["pos"])
            logits = _compute_step_logits(
                model_params, cfg, hidden[:, -1], cfg_scale, st.use_cfg) + bias

            from zonos_tpu.ops.eos import EosState, eos_logit_mask, eos_update

            eos_state = EosState(
                remaining=s["remaining"], stopping=s["stopping"],
                eos_mode=s["eos_mode"], steps_after_eos=s["steps_after_eos"],
            )

            # per-sample repetition penalty, 1.0 in EOS mode (ref model.py:356)
            rp = jnp.where(eos_state.eos_mode, 1.0, st.sampling.repetition_penalty).astype(jnp.float32)

            # EOS suppressed while the silence window runs (ref model.py:360-362)
            logits, eos_state = eos_logit_mask(eos_state, logits, eos_id)

            gen_window = jax.lax.dynamic_slice_in_dim(
                s["delayed"], jnp.maximum(offset - window, 0), window, axis=2
            )

            ks = jax.vmap(lambda k: jax.random.split(k, 3))(s["key"])  # [B, 3]
            key, k1, k2 = ks[:, 0], ks[:, 1], ks[:, 2]
            token = sample_from_logits(
                k1, logits, st.sampling, generated_tokens=gen_window, repetition_penalty=rp
            ).astype(jnp.int32)

            # the first-EOS substitute frame, sampled with EOS banned — only
            # computed on the (rare) step where some sample first hits EOS;
            # the full sampling pipeline is ~a third of the non-matmul op
            # count per step, so running it twice every step is pure waste
            def sample_banned(_):
                logits_banned = logits.at[:, 0, eos_id].set(-jnp.inf)
                return sample_from_logits(
                    k2, logits_banned, st.sampling,
                    generated_tokens=gen_window, repetition_penalty=rp,
                ).astype(jnp.int32)

            any_new_eos = jnp.any((token[:, 0] == eos_id) & (~eos_state.eos_mode))
            token2 = jax.lax.cond(any_new_eos, sample_banned, lambda _: token, None)

            token, eos_state = eos_update(
                eos_state, token, token2, eos_id, mask_id, K, MAX_STEPS_AFTER_EOS
            )

            frame = jax.lax.dynamic_slice_in_dim(s["delayed"], offset, 1, axis=2)
            merged = jnp.where(frame == UNKNOWN_TOKEN, token[..., None], frame)
            delayed = jax.lax.dynamic_update_slice_in_dim(s["delayed"], merged, offset, axis=2)

            return dict(
                delayed=delayed,
                cache=cache,
                offset=offset,
                pos=s["pos"] + 1,
                remaining=eos_state.remaining,
                stopping=eos_state.stopping,
                eos_mode=eos_state.eos_mode,
                steps_after_eos=eos_state.steps_after_eos,
                key=key,
            )

        return jax.lax.while_loop(cond_fn, body_fn, state)

    return init, loop


def build_generate_fn(cfg: ZonosConfig, statics: GenerateStatics,
                      decode_step_fn=None, prefill_fn=None, cache_fn=None) -> Callable:
    """One-shot generate(params, prefix_cond, prefix_codes, cfg_scale, key)
    -> (delayed_codes, final_offset), fully fused (no chunking)."""
    init, loop = build_generate_parts(cfg, statics, decode_step_fn, prefill_fn, cache_fn)

    def generate(model_params, prefix_cond, prefix_codes, cfg_scale, key):
        state = init(model_params, prefix_cond, prefix_codes, cfg_scale, key)
        state = loop(model_params, state, cfg_scale, jnp.int32(2**30))
        return state["delayed"], state["offset"]

    return generate


def default_cache_growth(total_seq: int, batch_size: int, is_transformer: bool = True) -> bool:
    """Default for ``Zonos.generate(cache_growth=...)``.

    Per-step cache HBM reads scale with the *allocated* length, so bucketed
    growth pays whenever those reads are a meaningful share of the step's
    traffic: any long sequence (>1024), or — transformer only — batch >= 8
    once the budget exceeds the first bucket plus one doubling (~448).
    Measured at batch 64 over 10-s utterances (int8 weights, f8 KV):
    72.2 -> 84.8 RTF.  At batch 1 the cache is a few percent of the weight
    stream and the extra per-bucket loop compiles are not worth it.

    The hybrid's per-step cache traffic is dominated by its fixed-size
    Mamba2 SSM states, not the 4 attention layers' KV — growth shrinks
    almost nothing there and the chunk-boundary syncs cost ~3% (measured
    batch 64: 57.1 -> 55.3 RTF), so the hybrid only grows past 1024 where
    it bounds allocation.
    """
    if total_seq > 1024:
        return True
    return is_transformer and batch_size >= 8 and total_seq > 448


# ---------------------------------------------------------------------------
# Public model class (host orchestration)
# ---------------------------------------------------------------------------


class Zonos:
    """User-facing model wrapper (API parity with zonos/model.py:22-88)."""

    def __init__(self, config: ZonosConfig, params: dict | None = None, seed: int = 0):
        self.config = config
        self.specs = build_specs(config.prefix_conditioner, config.backbone.d_model)
        self.eos_token_id = config.eos_token_id
        self.masked_token_id = config.masked_token_id
        self._spk_tower = None
        self._autoencoder = None
        self._generate_cache: dict = {}
        if params is None:
            params = self.init_params(jax.random.key(seed))
        self.params = params

    # -- parameters ------------------------------------------------------
    def init_params(self, key: jax.Array) -> dict:
        k1, k2, k3 = jax.random.split(key, 3)
        cfg = self.config
        if not cfg.backbone.is_transformer:
            from zonos_tpu.models.hybrid import init_hybrid_params

            backbone = init_hybrid_params(k1, cfg.backbone)
        else:
            backbone = init_transformer_params(k1, cfg.backbone)
        p = {
            "backbone": backbone,
            "prefix_conditioner": init_prefix_conditioner_params(k2, cfg.prefix_conditioner, cfg.backbone.d_model),
        }
        p.update(init_embed_head_params(k3, cfg))
        return p

    def quantize_int8(self) -> "Zonos":
        """Quantize the decode-dominant weights (attention/MLP projections and
        the output heads) to per-channel int8.  Halves the per-step HBM weight
        traffic of the bandwidth-bound AR decode at a small numeric cost;
        embeddings/norms/conditioner weights stay bf16."""
        from zonos_tpu.models.backbone import quantize_weight_int8

        return self._quantize(quantize_weight_int8)

    def quantize_int4(self, group_size: int = 128) -> "Zonos":
        """Group-wise int4 serving mode: a quarter of bf16's per-step HBM
        weight bytes (XLA packs two nibbles per byte on TPU).  Larger numeric
        cost than int8 — per-group scales keep the error local; intended for
        throughput-first serving."""
        from zonos_tpu.models.backbone import quantize_weight_int4

        return self._quantize(lambda w: quantize_weight_int4(w, group_size))

    def _quantize(self, qfn) -> "Zonos":
        def q_or_keep(w):
            try:
                return qfn(w)
            except ValueError:  # e.g. int4 group_size does not divide this dim
                return w

        if self.config.backbone.is_transformer:
            layers = dict(self.params["backbone"]["layers"])
            for name in ("wqkv", "wo", "w1", "w2"):
                layers[name] = q_or_keep(layers[name])
            backbone = {**self.params["backbone"], "layers": layers}
        else:
            # hybrid: per-layer dicts; quantize every dense projection
            layers_list = []
            for lp in self.params["backbone"]["layers_list"]:
                lp = dict(lp)
                for name in ("in_proj", "out_proj", "wqkv", "wo", "w1", "w2"):
                    if name in lp:
                        lp[name] = q_or_keep(lp[name])
                layers_list.append(lp)
            backbone = {**self.params["backbone"], "layers_list": layers_list}
        self.params = {
            **self.params,
            "backbone": backbone,
            "heads": q_or_keep(self.params["heads"]),
        }
        self._generate_cache.clear()
        return self

    def shard(self, mesh) -> "Zonos":
        """Place the parameters on a ``("data", "model")`` mesh with the
        serving shardings (TP attention heads / MLP hidden / vocab along
        ``model``; see parallel/sharding.py).  Subsequent ``generate`` calls
        jit against the sharded params, and XLA propagates the layout through
        the whole decode program — batches shard along ``data``, TP-partial
        logits all-reduce over ``model`` (SURVEY.md §2.4)."""
        from zonos_tpu.parallel.sharding import shard_params

        self.params = shard_params(mesh, self.params)
        self._generate_cache.clear()
        return self

    @classmethod
    def from_local(cls, config_path: str, model_path: str | None = None, mesh=None) -> "Zonos":
        """Load from reference-format files.  With ``mesh``, weights are
        placed straight under their serving shardings during conversion
        (no full on-device replica — see utils/checkpoint.py)."""
        from zonos_tpu.utils.checkpoint import load_zonos_checkpoint

        cfg = ZonosConfig.from_json(config_path)
        model = cls(cfg)
        if model_path is not None:
            model.params = load_zonos_checkpoint(cfg, model_path, model.params, mesh=mesh)
        elif mesh is not None:
            return model.shard(mesh)
        return model

    @classmethod
    def from_pretrained(cls, repo_id: str, revision: str | None = None, mesh=None) -> "Zonos":
        from zonos_tpu.utils.hub import hub_download

        config_path = hub_download(repo_id=repo_id, filename="config.json", revision=revision)
        model_path = hub_download(repo_id=repo_id, filename="model.safetensors", revision=revision)
        return cls.from_local(config_path, model_path, mesh=mesh)

    # -- subsystems ------------------------------------------------------
    @property
    def autoencoder(self):
        if self._autoencoder is None:
            from zonos_tpu.models.dac import DACAutoencoder

            self._autoencoder = DACAutoencoder()
        return self._autoencoder

    def make_speaker_embedding(self, wav: np.ndarray, sr: int) -> np.ndarray:
        """Reference clip -> [1, 1, 128] LDA speaker embedding
        (ref: zonos/model.py:90-95)."""
        if self._spk_tower is None:
            from zonos_tpu.models.speaker import SpeakerEmbeddingLDA

            self._spk_tower = SpeakerEmbeddingLDA()
        _, lda = self._spk_tower(wav, sr)
        return np.asarray(lda, np.float32).reshape(1, 1, -1)

    # -- conditioning ----------------------------------------------------
    def prepare_conditioning(
        self, cond_dict: dict, uncond_dict: dict | None = None, pad_to_multiple: int = 1
    ) -> jnp.ndarray:
        """-> [2B, cond_len, d_model]: cond prefix stacked over uncond prefix
        (ref: zonos/model.py:210-218).  ``pad_to_multiple`` buckets the
        phoneme length so varied texts reuse compiled generate programs."""
        if uncond_dict is None:
            uncond_dict = {k: cond_dict[k] for k in required_keys(self.specs) if k in cond_dict}
        cond_in = prepare_cond_inputs(self.specs, cond_dict, pad_to_multiple)
        uncond_in = prepare_cond_inputs(self.specs, uncond_dict, pad_to_multiple)
        pp = self.params["prefix_conditioner"]
        pc = self.config.prefix_conditioner
        cond = prefix_conditioner_forward(pp, self.specs, pc, cond_in, self.config.backbone.norm_epsilon)
        uncond = prefix_conditioner_forward(pp, self.specs, pc, uncond_in, self.config.backbone.norm_epsilon)
        B = max(cond.shape[0], uncond.shape[0])
        cond = jnp.broadcast_to(cond, (B, *cond.shape[1:]))
        uncond = jnp.broadcast_to(uncond, (B, *uncond.shape[1:]))
        return jnp.concatenate([cond, uncond], axis=0)

    # -- generation ------------------------------------------------------
    @property
    def compute_dtype(self):
        """Serving compute dtype, taken from the loaded parameters: bf16 for
        production checkpoints (the reference casts the model to bf16,
        zonos/model.py:79), fp32 when the params were loaded fp32 (parity
        runs) — the prefix cast and KV/SSM cache storage follow it."""
        return self.params["embeddings"].dtype

    def _get_generate_parts(self, statics: GenerateStatics, cache_len: int | None = None):
        parts = self._generate_cache.get((statics, cache_len))
        if parts is None:
            dtype = self.compute_dtype
            if self.config.backbone.is_transformer:
                decode_fn, prefill_fn = None, None
                cache_fn = lambda batch, seqlen: KVCache.create(
                    self.config.backbone, batch, seqlen, dtype=dtype
                )
            else:
                from zonos_tpu.models.hybrid import (
                    create_hybrid_cache,
                    hybrid_decode_step,
                    hybrid_prefill,
                )

                decode_fn, prefill_fn = hybrid_decode_step, hybrid_prefill
                cache_fn = lambda batch, seqlen: create_hybrid_cache(
                    self.config.backbone, batch, seqlen, dtype=dtype
                )
            init, loop = build_generate_parts(
                self.config, statics, decode_fn, prefill_fn, cache_fn, cache_len=cache_len
            )
            parts = (jax.jit(init), jax.jit(loop, donate_argnums=(1,)))
            self._generate_cache[(statics, cache_len)] = parts
        return parts

    def _row_keys(self, seed, batch_size: int) -> jnp.ndarray:
        """Per-sample PRNG keys [B] from ``seed`` (scalar or per-row list).

        Row i's key is ``fold_in(key(0), seed_i)`` — a function of that
        row's seed ALONE, so a request's sampled audio is bit-identical
        whether it runs solo or co-batched with arbitrary peers (the
        serving batcher passes each request's own seed).  A scalar seed
        fans out as ``seed + row`` (distinct rows stay distinct; batch 1
        matches a serving row with the same seed).

        Built on the host CPU backend: eager device ops here would each be
        a full round-trip on a tunneled TPU for a few bytes the jitted init
        transfers anyway."""
        seeds = np.asarray(seed, np.int64)
        if seeds.ndim == 0:
            seeds = int(seeds) + np.arange(batch_size, dtype=np.int64)
        elif seeds.shape != (batch_size,):
            raise ValueError(f"seed must be a scalar or length-{batch_size} "
                             f"sequence, got shape {seeds.shape}")
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            base = jax.random.key(0)
            return jax.vmap(lambda s: jax.random.fold_in(base, s))(
                jnp.asarray(seeds.astype(np.uint32)))

    def _grow_cache(self, cache, new_len: int):
        if self.config.backbone.is_transformer:
            return cache.grow(new_len)
        from zonos_tpu.models.hybrid import grow_hybrid_cache

        return grow_hybrid_cache(cache, new_len)

    def generate(
        self,
        prefix_conditioning: jnp.ndarray,  # [2B, cond_len, d_model]
        audio_prefix_codes: np.ndarray | None = None,  # [B, K, P]
        max_new_tokens: int = 86 * 30,
        cfg_scale: float = 2.0,
        batch_size: int = 1,
        sampling_params: dict | SamplingParams | None = None,
        seed: int = 423,
        progress_bar: bool = True,
        callback: Callable[[np.ndarray, int, int], bool] | None = None,
        cache_growth: bool | None = None,
        step_limits: np.ndarray | list[int] | int | None = None,
    ) -> list[np.ndarray]:
        """Sample DAC codes; returns a list of [K, T_i] arrays (per-sample
        EOS-trimmed, audio prefix removed) — the reference's output contract
        (zonos/model.py:437-457).

        ``cache_growth`` starts the KV cache at a small bucket and doubles
        it at host chunk boundaries instead of allocating the 30-s maximum
        up front — per-step cache HBM reads scale with the *allocated*
        length, so long generations decode much faster early on.  Results
        are bit-identical (validity is masked; -inf scores weigh exactly 0).
        Default: :func:`default_cache_growth` — on for long sequences or
        batch >= 8 (a few extra compiles, one per bucket, amortized by the
        jit cache).

        ``step_limits``: per-sample (or scalar) cap on new frames, traced —
        shorter requests run under the SAME compiled program (sized by
        ``max_new_tokens``) and are trimmed to their own cap; with cache
        growth the cache also stops growing when all samples finish.

        ``seed``: scalar, or a length-``batch_size`` sequence of per-sample
        seeds.  Each sample draws from its own stream keyed by its seed
        alone (see :meth:`_row_keys`), so a sample's codes do not depend on
        its co-batched peers; a scalar fans out as ``seed + row``."""
        if prefix_conditioning.shape[0] != 2 * batch_size:
            raise ValueError(
                f"prefix_conditioning batch {prefix_conditioning.shape[0]} != 2*{batch_size}"
            )
        sampling = sampling_params
        if sampling is None:
            sampling = SamplingParams()
        elif isinstance(sampling, dict):
            sampling = SamplingParams(**sampling)

        K = self.config.num_codebooks
        prefix_audio_len = 0 if audio_prefix_codes is None else audio_prefix_codes.shape[2]
        # cfg_scale == 1.0 makes the CFG blend the identity on the cond
        # logits, so the uncond half (half of every matmul / cache / state)
        # is dropped statically — a 2x serving lever for CFG-free traffic
        use_cfg = float(cfg_scale) != 1.0
        statics = GenerateStatics(
            batch_size=batch_size,
            cond_len=int(prefix_conditioning.shape[1]),
            prefix_audio_len=prefix_audio_len,
            max_new_tokens=max_new_tokens,
            sampling=sampling,
            use_cfg=use_cfg,
        )
        if not use_cfg:
            prefix_conditioning = prefix_conditioning[:batch_size]
        from zonos_tpu.config import find_multiple

        total_seq = find_multiple(statics.cond_len + prefix_audio_len + max_new_tokens + K, 64)
        if cache_growth is None:
            cache_growth = default_cache_growth(
                total_seq, batch_size, self.config.backbone.is_transformer
            )
        if cache_growth:
            cache_len = find_multiple(
                min(total_seq, statics.cond_len + prefix_audio_len + 1 + 256), 64
            )
        else:
            cache_len = total_seq
        init, loop = self._get_generate_parts(statics, cache_len if cache_growth else None)
        prefix_codes = (
            jnp.zeros((batch_size, K, 0), jnp.int32)
            if audio_prefix_codes is None
            else jnp.asarray(audio_prefix_codes, jnp.int32)
        )
        cfg_scale_arr = jnp.float32(cfg_scale)
        limits_arr = None
        if step_limits is not None:
            limits_arr = jnp.broadcast_to(
                jnp.asarray(step_limits, jnp.int32), (batch_size,)
            )
        state = init(
            self.params,
            jnp.asarray(prefix_conditioning, self.compute_dtype),
            prefix_codes,
            cfg_scale_arr,
            self._row_keys(seed, batch_size),
            step_limit=limits_arr,
        )
        max_steps = max_new_tokens + K - 1
        chunked = callback is not None or progress_bar
        if not chunked and not cache_growth:
            state = loop(self.params, state, cfg_scale_arr, jnp.int32(2**30))
        else:
            # chunked decode: same compiled loop, bounded per chunk, so the
            # host can report progress / allow cancellation between chunks
            # (the step-callback contract of zonos/model.py:430-432) and
            # grow the cache bucket when the write position reaches it.
            from tqdm import tqdm

            interval = 32 if chunked else 2**30
            done = 0
            bar = tqdm(total=max_steps, desc="Generating", disable=not progress_bar)
            while done < max_steps:
                room = cache_len - int(state["pos"])
                if room <= 0:
                    cache_len = min(total_seq, find_multiple(cache_len * 2, 64))
                    state["cache"] = self._grow_cache(state["cache"], cache_len)
                    room = cache_len - int(state["pos"])
                steps = min(interval, room) if cache_len < total_seq else interval
                state = loop(self.params, state, cfg_scale_arr, jnp.int32(steps))
                remaining = int(jnp.max(state["remaining"]))
                new_done = min(max_steps, max_steps - remaining)
                bar.update(new_done - done)
                done = new_done
                # consult the callback before breaking so it also sees the
                # finishing chunk (the reference calls it on every step
                # including the last, zonos/model.py:430-432)
                if callback is not None:
                    offset_now = int(state["offset"])
                    frame = np.asarray(state["delayed"][..., offset_now : offset_now + 1])
                    if not callback(frame, done, max_steps):
                        break
                if remaining <= 0:
                    break
            bar.close()
        # one transfer for both results (two separate fetches are two
        # round-trips on a tunneled device)
        delayed, offset_arr = jax.device_get((state["delayed"], state["offset"]))
        offset = int(offset_arr)

        out = revert_delay_pattern(delayed)
        # first EOS per sample in codebook 0; position 0 (no hit, or a hit
        # at frame 0) means full length — reference semantics
        # (zonos/model.py:441-442: eos_positions[eos_positions == 0] = T)
        eos_pos = np.asarray(out[:, 0, :] == self.eos_token_id).argmax(axis=1)
        eos_pos[eos_pos == 0] = out.shape[2]
        out = out[..., : offset - K]
        out = np.where(out >= self.config.codebook_size, 0, out)
        limits_np = (
            None if step_limits is None
            else np.broadcast_to(np.asarray(step_limits, np.int64), (out.shape[0],))
        )
        results = []
        for i in range(out.shape[0]):
            end = min(int(eos_pos[i]), out.shape[2])
            if limits_np is not None:
                end = min(end, prefix_audio_len + int(limits_np[i]))
            results.append(out[i, :, prefix_audio_len:end].copy())
        return results

    def stream_generate(
        self,
        prefix_conditioning: jnp.ndarray,  # [2, cond_len, d_model] (batch 1)
        audio_prefix_codes: np.ndarray | None = None,
        max_new_tokens: int = 86 * 30,
        cfg_scale: float = 2.0,
        sampling_params: dict | SamplingParams | None = None,
        seed: int = 423,
        chunk_frames: int = 43,
        margin_frames: int = 32,
    ):
        """Streaming synthesis (batch 1): yields float32 waveform chunks
        (44.1 kHz, [samples]) while the AR decode runs, instead of waiting
        for the full utterance.  Time-to-first-audio ≈ prefill +
        ``chunk_frames`` decode steps (~0.5 s of audio per 43 frames).

        Each yielded sample is *final*: the vocoder is convolutional, so a
        window is decoded with ``margin_frames`` of code context on both
        sides and only the interior is emitted — the concatenation equals
        the non-streaming decode of the same codes.  The margin must cover
        the DAC decoder's receptive half-width — 12 code frames for the
        44.1 kHz config (analytic bound in
        ``models/dac/codec.py:decoder_receptive_field_frames``; measured
        10.11 frames) — and margins below it raise ``ValueError``.  The
        default 32 frames ≈ 0.37 s is ample.

        Not in the reference (its closest feature is the per-step progress
        callback, zonos/model.py:430-432); loudness normalization and fades
        are whole-utterance post-steps and do not apply when streaming.

        Thin wrapper over :meth:`stream_generate_batch` at batch 1.
        """
        if prefix_conditioning.shape[0] != 2:
            raise ValueError("stream_generate supports batch_size=1 only")
        for events in self.stream_generate_batch(
            prefix_conditioning,
            audio_prefix_codes=audio_prefix_codes,
            max_new_tokens=max_new_tokens,
            cfg_scale=cfg_scale,
            sampling_params=sampling_params,
            seed=seed,
            chunk_frames=chunk_frames,
            margin_frames=margin_frames,
            batch_size=1,
        ):
            for _row, chunk in events:
                yield chunk

    def stream_generate_batch(
        self,
        prefix_conditioning: jnp.ndarray,  # [2B, cond_len, d_model]
        audio_prefix_codes: np.ndarray | None = None,
        max_new_tokens: int = 86 * 30,
        cfg_scale: float = 2.0,
        sampling_params: dict | SamplingParams | None = None,
        seed: int = 423,
        chunk_frames: int = 43,
        margin_frames: int = 32,
        batch_size: int = 1,
        step_limits=None,
        active_rows=None,
    ):
        """Batched streaming synthesis: N concurrent streams ride ONE decode
        program (the loop is already batched — only emission is per-row).
        Yields, per decode chunk, a list of ``(row, waveform_chunk)`` events;
        rows hit EOS / their ``step_limits`` cap independently and simply
        stop producing events (per-row EOS semantics identical to
        ``generate``, zonos/model.py:441-442).

        Emission parity: steady-state chunks are vocoded batched from a
        window that carries ≥ ``margin_frames`` of *real* code context on
        both sides, so interiors equal the full decode — sound iff
        ``margin_frames`` ≥ the DAC decoder's receptive half-width
        (``self.autoencoder.receptive_field_frames``, 12 for the 44.1 kHz
        config; enforced below).  A row's FINAL chunk
        is vocoded per-row on exactly ``codes[:end]`` — no fake right
        context — so the concatenation per row is sample-identical to the
        non-streaming decode of that row's codes (tests/test_streaming.py).

        Every device interaction happens inside ``next()`` on this
        generator, so a caller can serialize chip access per-chunk (e.g. the
        serving batcher's ``device_lock``) instead of per-stream —
        concurrent stream groups interleave at chunk granularity.

        ``active_rows``: optional bool mask [B]; False rows (bucket padding)
        produce no events and no vocode work.
        """
        if prefix_conditioning.shape[0] != 2 * batch_size:
            raise ValueError(
                f"prefix_conditioning rows ({prefix_conditioning.shape[0]}) "
                f"!= 2*batch_size ({2 * batch_size})"
            )
        rf = self.autoencoder.receptive_field_frames
        if margin_frames < rf:
            raise ValueError(
                f"margin_frames={margin_frames} is below the DAC decoder's "
                f"receptive half-width ({rf} frames) — emitted chunks would "
                f"not be final (see decoder_receptive_field_frames)"
            )
        sampling = sampling_params
        if sampling is None:
            sampling = SamplingParams()
        elif isinstance(sampling, dict):
            sampling = SamplingParams(**sampling)

        K = self.config.num_codebooks
        B = batch_size
        prefix_audio_len = 0 if audio_prefix_codes is None else audio_prefix_codes.shape[2]
        use_cfg = float(cfg_scale) != 1.0
        statics = GenerateStatics(
            batch_size=B,
            cond_len=int(prefix_conditioning.shape[1]),
            prefix_audio_len=prefix_audio_len,
            max_new_tokens=max_new_tokens,
            sampling=sampling,
            use_cfg=use_cfg,
        )
        if not use_cfg:
            prefix_conditioning = prefix_conditioning[:B]
        init, loop = self._get_generate_parts(statics)
        prefix_codes = (
            jnp.zeros((B, K, 0), jnp.int32)
            if audio_prefix_codes is None
            else jnp.asarray(audio_prefix_codes, jnp.int32)
        )
        cfg_scale_arr = jnp.float32(cfg_scale)
        limits_arr = None
        limits_np = None
        if step_limits is not None:
            limits_np = np.broadcast_to(np.asarray(step_limits, np.int64), (B,))
            limits_arr = jnp.asarray(limits_np, jnp.int32)
        state = init(
            self.params,
            jnp.asarray(prefix_conditioning, self.compute_dtype),
            prefix_codes,
            cfg_scale_arr,
            self._row_keys(seed, B),
            step_limit=limits_arr,
        )

        hop = 512
        emitted = np.zeros((B,), np.int64)  # frames emitted, post-prefix
        ends = np.full((B,), -1, np.int64)  # final length once known
        row_done = np.zeros((B,), bool)
        if active_rows is not None:
            # bucket-padding rows (serving): never vocode them — each padded
            # final would be a fresh unwarmed DAC compile whose output the
            # caller discards anyway
            row_done = ~np.asarray(active_rows, bool)

        def finalized_codes():
            """[B, K, avail] codes reverted from the delay buffer (final,
            prefix-sliced, masked ids zeroed) + updated per-row ends."""
            delayed, offset_arr = jax.device_get((state["delayed"], state["offset"]))
            out = revert_delay_pattern(delayed)[:, :, : int(offset_arr) - K]
            is_eos = np.asarray(out[:, 0, prefix_audio_len:] == self.eos_token_id)
            avail_now = is_eos.shape[1]
            # first chunks can be shorter than the K-deep delay staircase:
            # nothing reverted yet (argmax would choke on the empty axis)
            pos = (np.zeros((B,), np.int64) if avail_now == 0
                   else is_eos.argmax(axis=1))
            for i in range(B):
                if ends[i] >= 0:
                    continue
                # argmax == 0 (no hit, or hit at frame 0) => full length
                # (reference semantics, zonos/model.py:441-442) — leave the
                # end open until the loop itself finishes
                cand = int(pos[i]) if (is_eos[i].any() and pos[i] > 0) else None
                if limits_np is not None:
                    lim = int(limits_np[i])
                    if cand is None or cand > lim:
                        # the limit binds; final once codes through it exist
                        cand = lim if avail_now >= lim else None
                if cand is not None:
                    ends[i] = cand
            out = np.where(out >= self.config.codebook_size, 0, out)
            return out[:, :, prefix_audio_len:]

        def decode_rows(codes_w):
            """[R, K, W] window -> [R, samples] float32."""
            return np.asarray(self.autoencoder.decode(codes_w))[:, 0]

        def bucket_w0(w0: int, hi: int) -> int:
            """Pull the window start DOWN so the vocode width hits a
            32-frame bucket: stream windows otherwise present a new width
            almost every chunk (start-up, per-row finals), and each width is
            an XLA compile of the DAC decoder.  Extra LEFT context beyond
            the margin only moves the result closer to the full decode."""
            width = -(-(hi - w0) // 32) * 32
            return max(0, hi - width)

        done = False
        while not done:
            state = loop(self.params, state, cfg_scale_arr, jnp.int32(chunk_frames))
            done = int(jnp.max(state["remaining"])) <= 0
            codes = finalized_codes()
            avail = codes.shape[2]
            if done:
                for i in range(B):
                    if ends[i] < 0:
                        ends[i] = avail if limits_np is None else min(avail, limits_np[i])
            hi_steady = avail if done else avail - margin_frames
            events: list[tuple[int, np.ndarray]] = []
            steady: list[int] = []
            for i in range(B):
                if row_done[i]:
                    continue
                if ends[i] >= 0:
                    # end known => every remaining code for this row is final
                    # (ends is only set once codes through it exist): emit the
                    # whole remainder, vocoded on the row's exact code length
                    lo = int(emitted[i])
                    if ends[i] > lo:
                        w0 = bucket_w0(max(0, lo - margin_frames), int(ends[i]))
                        wav = decode_rows(codes[i : i + 1, :, w0 : ends[i]])[0]
                        events.append((i, wav[(lo - w0) * hop : (ends[i] - w0) * hop]))
                        emitted[i] = ends[i]
                    row_done[i] = True
                elif hi_steady > emitted[i]:
                    steady.append(i)
            if steady:
                w0 = bucket_w0(
                    max(0, int(min(emitted[i] for i in steady)) - margin_frames),
                    avail)
                wavs = decode_rows(codes[steady, :, w0:avail])
                for j, i in enumerate(steady):
                    lo = int(emitted[i])
                    events.append((i, wavs[j, (lo - w0) * hop : (hi_steady - w0) * hop]))
                    emitted[i] = hi_steady
            if events:
                yield events
            if row_done.all():
                break
