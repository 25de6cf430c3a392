"""Golden-parity harness vs the PyTorch reference (BASELINE.json metric:
"waveform allclose vs ref", greedy decode on the sample.py config).

The reference stack (torch+CUDA, eSpeak, mamba_ssm) and this framework
rarely coexist on one machine, so parity runs in two stages around a
portable .npz:

  Stage A (this framework):
    python tools/parity_vs_reference.py dump --out zonos_tpu_parity.npz
    # or against local reference-format files (any backbone):
    python tools/parity_vs_reference.py dump --config config.json \
        --checkpoint model.safetensors --out zonos_tpu_parity.npz
  Stage B (a machine with the reference installed):
    run the reference's sample.py config with torch.manual_seed(421),
    temperature=0 (greedy), the same text/speaker clip, and save:
      np.savez("ref_parity.npz", phonemes=..., prefix=cond_prefix.float(),
               logits=first_step_logits.float(), codes=codes, wav=wav)
  Compare (either machine):
    python tools/parity_vs_reference.py compare zonos_tpu_parity.npz ref_parity.npz

Checked artifacts, in dependency order (so a mismatch localizes the layer):
  1. phoneme id sequence          (text frontend, conditioning.py:186-191)
  2. prefix conditioning [2,L,d]  (conditioners+projection, conditioning.py:380-389)
  3. first-step CFG logits [9,V]  (backbone+heads+CFG, model.py:103-116)
  4. greedy codes [9,T]           (decode loop + EOS, model.py:224-457)
  5. waveform                     (DAC decode, autoencoder.py:188-245)

Requires the real checkpoints under $ZONOS_TPU_MODELS_DIR (README) or
explicit --config/--checkpoint paths; exits with a clear message otherwise.
The tool's own plumbing is exercised end-to-end against a fake
reference-keyed checkpoint in tests/test_parity_tool.py, so when real
weights appear only the files themselves are the missing ingredient.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEXT = "Hello, world! This is a test of the text to speech system."
LANG = "en-us"


def _load_model(args):
    from zonos_tpu.models.tts import Zonos

    if args.config:
        if not os.path.exists(args.config):
            sys.exit(f"--config not found: {args.config}")
        if args.checkpoint and not os.path.exists(args.checkpoint):
            sys.exit(f"--checkpoint not found: {args.checkpoint}")
        return Zonos.from_local(args.config, args.checkpoint)
    try:
        return Zonos.from_pretrained(args.model)
    except FileNotFoundError as e:
        sys.exit(f"real checkpoint required for parity: {e}")


def _first_step_logits(model, prefix, cfg_scale: float) -> np.ndarray:
    """Prefill-only CFG logits for the first frame, backbone-agnostic
    (the same dispatch models/tts.py:404-412 uses inside generate)."""
    import jax.numpy as jnp

    from zonos_tpu.models.tts import _compute_step_logits, embed_codes

    cfg = model.config
    delayed0 = np.full((1, cfg.num_codebooks, 1), cfg.masked_token_id, np.int32)
    x = jnp.concatenate(
        [prefix, jnp.tile(embed_codes(model.params, jnp.asarray(delayed0)), (2, 1, 1)).astype(prefix.dtype)],
        axis=1,
    )
    B2, total = int(x.shape[0]), int(x.shape[1]) + 8
    if cfg.backbone.is_transformer:
        from zonos_tpu.models.backbone import KVCache, transformer_prefill

        cache = KVCache.create(cfg.backbone, B2, total)
        hidden, _ = transformer_prefill(cfg.backbone, model.params["backbone"], x, cache)
    else:
        from zonos_tpu.models.hybrid import create_hybrid_cache, hybrid_prefill

        cache = create_hybrid_cache(cfg.backbone, B2, total)
        hidden, _ = hybrid_prefill(cfg.backbone, model.params["backbone"], x, cache)
    logits = _compute_step_logits(model.params, cfg, hidden[:, -1], jnp.float32(cfg_scale))
    return np.asarray(logits[0, :, : cfg.output_vocab_size], np.float32)


def dump(args) -> None:
    from zonos_tpu.conditioning import make_cond_dict
    from zonos_tpu.ops.sampling import SamplingParams
    from zonos_tpu.text import phonemize, tokenize_phonemes

    model = _load_model(args)

    if args.speaker_wav:
        from zonos_tpu.audio.io import load_audio

        wav, sr = load_audio(args.speaker_wav)
        speaker = model.make_speaker_embedding(np.asarray(wav), sr)
    else:
        speaker = np.zeros((1, 1, 128), np.float32)

    ids, _ = tokenize_phonemes(phonemize([args.text], [LANG]))
    cond = make_cond_dict(text=args.text, speaker=speaker, language=LANG)
    prefix = model.prepare_conditioning(cond)

    codes = model.generate(
        prefix,
        max_new_tokens=args.max_new_tokens,
        sampling_params=SamplingParams.greedy(),
        seed=421,
        progress_bar=False,
    )
    wavs = model.autoencoder.codes_to_wavs([codes[0]])
    wav = wavs[0].reshape(-1) if codes[0].shape[-1] else np.zeros((0,), np.float32)

    logits = _first_step_logits(model, prefix, args.cfg_scale)

    np.savez(
        args.out,
        phonemes=ids[0],
        prefix=np.asarray(prefix, np.float32),
        logits=logits,
        codes=codes[0],
        wav=wav,
    )
    print(f"wrote {args.out}: phonemes {ids.shape}, prefix {prefix.shape}, codes {codes[0].shape}")


def compare(ours_path: str, ref_path: str) -> None:
    ours, ref = np.load(ours_path), np.load(ref_path)
    failed = False

    def check(name, a, b, rtol, atol, exact=False):
        nonlocal failed
        a, b = np.asarray(a), np.asarray(b)
        if a.shape != b.shape:
            print(f"FAIL {name}: shape {a.shape} vs {b.shape}")
            failed = True
            return
        if exact:
            ok = np.array_equal(a, b)
            detail = f"{(a != b).sum()} mismatches" if not ok else ""
        else:
            ok = np.allclose(a, b, rtol=rtol, atol=atol)
            detail = f"max abs err {np.abs(a - b).max():.4g}" if not ok else ""
        print(f"{'PASS' if ok else 'FAIL'} {name} {detail}")
        failed |= not ok

    check("phonemes", ours["phonemes"], ref["phonemes"], 0, 0, exact=True)
    check("prefix conditioning", ours["prefix"], ref["prefix"], 1e-2, 1e-2)
    check("first-step logits", ours["logits"], ref["logits"], 5e-2, 5e-2)
    check("greedy codes", ours["codes"], ref["codes"], 0, 0, exact=True)
    check("waveform", ours["wav"], ref["wav"], 1e-2, 1e-2)
    sys.exit(1 if failed else 0)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_dump = sub.add_parser("dump")
    p_dump.add_argument("--out", default="zonos_tpu_parity.npz")
    p_dump.add_argument("--speaker_wav", default=None)
    p_dump.add_argument("--model", default="Zyphra/Zonos-v0.1-transformer",
                        help="hub repo id (transformer or hybrid)")
    p_dump.add_argument("--config", default=None,
                        help="local reference-format config.json (overrides --model)")
    p_dump.add_argument("--checkpoint", default=None,
                        help="local model.safetensors to pair with --config")
    p_dump.add_argument("--text", default=TEXT)
    p_dump.add_argument("--max_new_tokens", type=int, default=86 * 10)
    p_dump.add_argument("--cfg_scale", type=float, default=2.0)
    p_cmp = sub.add_parser("compare")
    p_cmp.add_argument("ours")
    p_cmp.add_argument("ref")
    args = ap.parse_args(argv)
    if args.cmd == "dump":
        dump(args)
    else:
        compare(args.ours, args.ref)


if __name__ == "__main__":
    main()
