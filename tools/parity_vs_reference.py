"""Golden-parity harness vs the PyTorch reference (BASELINE.json metric:
"waveform allclose vs ref", greedy decode on the sample.py config).

The reference stack (torch+CUDA, eSpeak, mamba_ssm) and this framework
rarely coexist on one machine, so parity runs in two stages around a
portable .npz:

  Stage A (this framework):
    python tools/parity_vs_reference.py dump --out zonos_tpu_parity.npz
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

Requires the real checkpoints under $ZONOS_TPU_MODELS_DIR (README); exits
with a clear message otherwise.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEXT = "Hello, world! This is a test of the text to speech system."
LANG = "en-us"


def dump(out_path: str, speaker_wav: str | None) -> None:
    import jax.numpy as jnp

    from zonos_tpu.conditioning import make_cond_dict
    from zonos_tpu.models.tts import Zonos, apply_heads, cfg_blend, embed_codes
    from zonos_tpu.ops.sampling import SamplingParams
    from zonos_tpu.text import phonemize, tokenize_phonemes

    try:
        model = Zonos.from_pretrained("Zyphra/Zonos-v0.1-transformer")
    except FileNotFoundError as e:
        sys.exit(f"real checkpoint required for parity: {e}")

    if speaker_wav:
        from zonos_tpu.audio.io import load_audio

        wav, sr = load_audio(speaker_wav)
        speaker = model.make_speaker_embedding(np.asarray(wav), sr)
    else:
        speaker = np.zeros((1, 1, 128), np.float32)

    ids, _ = tokenize_phonemes(phonemize([TEXT], [LANG]))
    cond = make_cond_dict(text=TEXT, speaker=speaker, language=LANG)
    prefix = model.prepare_conditioning(cond)

    codes = model.generate(
        prefix,
        max_new_tokens=86 * 10,
        sampling_params=SamplingParams.greedy(),
        seed=421,
        progress_bar=False,
    )
    wavs = model.autoencoder.codes_to_wavs([codes[0]])

    # first-step logits re-derived for the dump (prefill-only, greedy)
    from zonos_tpu.models.backbone import KVCache, transformer_prefill

    cfg = model.config
    delayed0 = np.full((1, cfg.num_codebooks, 1), cfg.masked_token_id, np.int32)
    x = jnp.concatenate(
        [prefix, jnp.tile(embed_codes(model.params, jnp.asarray(delayed0)), (2, 1, 1)).astype(prefix.dtype)],
        axis=1,
    )
    cache = KVCache.create(cfg.backbone, 2, int(x.shape[1]) + 8)
    hidden, _ = transformer_prefill(cfg.backbone, model.params["backbone"], x, cache)
    logits = cfg_blend(apply_heads(model.params, cfg, hidden[:, -1]), jnp.float32(2.0))

    np.savez(
        out_path,
        phonemes=ids[0],
        prefix=np.asarray(prefix, np.float32),
        logits=np.asarray(logits[0], np.float32),
        codes=codes[0],
        wav=wavs[0].reshape(-1),
    )
    print(f"wrote {out_path}: phonemes {ids.shape}, prefix {prefix.shape}, codes {codes[0].shape}")


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


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_dump = sub.add_parser("dump")
    p_dump.add_argument("--out", default="zonos_tpu_parity.npz")
    p_dump.add_argument("--speaker_wav", default=None)
    p_cmp = sub.add_parser("compare")
    p_cmp.add_argument("ours")
    p_cmp.add_argument("ref")
    args = ap.parse_args()
    if args.cmd == "dump":
        dump(args.out, args.speaker_wav)
    else:
        compare(args.ours, args.ref)


if __name__ == "__main__":
    main()
