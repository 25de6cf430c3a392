"""Single-utterance synthesis CLI (parity surface: zonos_cli.py).

    python -m zonos_tpu.apps.cli --text "Hello!" --language en-us \
        --reference_audio voice.wav --output out.wav
"""

from __future__ import annotations

import argparse

from zonos_tpu.apps.common import (
    add_conditioning_args,
    add_model_args,
    add_sampling_args,
    cond_dict_from_args,
    load_model,
    make_speaker,
    prefix_codes,
    sampling_params_from_args,
)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="Generate speech with zonos-tpu.")
    ap.add_argument("--text", required=True, help="Text to synthesize.")
    ap.add_argument("--output", default="output.wav", help="Output wav path.")
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--no_prefix_silence", action="store_true",
                    help="Skip the default 100 ms silence audio prefix.")
    # parity with zonos_cli.py:94 (there --progress_bar defaults True and
    # cannot actually be turned off; here the negative form can)
    ap.add_argument("--progress_bar", dest="progress_bar", default=True,
                    action="store_true", help="Show progress bar (default).")
    ap.add_argument("--no_progress_bar", dest="progress_bar", action="store_false")
    add_conditioning_args(ap)
    add_sampling_args(ap)
    add_model_args(ap)
    return ap


def main(argv: list[str] | None = None) -> None:
    from zonos_tpu.utils.profiling import PhaseTimer, device_trace

    args = build_parser().parse_args(argv)
    timer = PhaseTimer()
    print("Loading model...")
    with timer.phase("load"):
        model = load_model(args)
    with timer.phase("speaker"):
        speaker = make_speaker(args, model)
    prefix = None if args.no_prefix_silence and not args.prefix_audio else prefix_codes(args, model, args.batch_size)

    # one text replicated across the batch (generate requires prefix batch
    # 2*batch_size; a single string would conditions only one row)
    text = args.text if args.batch_size == 1 else [args.text] * args.batch_size
    cond = cond_dict_from_args(args, text, speaker)
    conditioning = model.prepare_conditioning(cond)
    print("Generating...")
    with timer.phase("generate"), device_trace(args.profile):
        codes = model.generate(
            conditioning,
            audio_prefix_codes=prefix,
            max_new_tokens=args.max_new_tokens,
            cfg_scale=args.cfg_scale,
            batch_size=args.batch_size,
            sampling_params=sampling_params_from_args(args),
            seed=args.seed,
            progress_bar=args.progress_bar,
        )
    outputs = (
        [args.output]
        if args.batch_size == 1
        else [args.output.replace(".wav", f"_{i}.wav") for i in range(args.batch_size)]
    )
    model.autoencoder.save_codes(outputs, codes)
    for p in outputs:
        print(f"wrote {p}")


if __name__ == "__main__":
    main()
