#!/usr/bin/env python
"""Offline inference / evaluation CLI — the reference's ``predict.py``
surface: transcribe one wav, or evaluate a manifest (optionally with
LM-fused beam search and a per-utterance CSV report)."""

from __future__ import annotations

import argparse
import logging

from lightning_asr_tpu.inference import AsrTranslator
from lightning_asr_tpu.utils import get_logger

logger = get_logger("predict")
logging.getLogger("lightning_asr_tpu").setLevel(logging.INFO)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True, help="checkpoint directory")
    ap.add_argument("--audio", help="single wav to transcribe")
    ap.add_argument("--manifest", help="JSONL manifest to evaluate")
    ap.add_argument("--lang", default="en", choices=["en", "cn"])
    ap.add_argument("--lm", help="ARPA LM path (enables host beam search)")
    ap.add_argument("--device_beam", action="store_true",
                    help="LM-free beam search on device instead of greedy")
    ap.add_argument("--long", action="store_true",
                    help="chunked transcription for long audio (> 40 s)")
    ap.add_argument("--stream", action="store_true",
                    help="simulate live streaming: feed the wav in "
                         "--stream_block_seconds blocks through "
                         "StreamingTranscriber, printing each partial")
    ap.add_argument("--stream_block_seconds", type=float, default=1.0)
    ap.add_argument("--chunk_seconds", type=float, default=20.0)
    ap.add_argument("--overlap_seconds", type=float, default=2.0)
    ap.add_argument("--beam_width", type=int, default=40)
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--beta", type=float, default=1.0)
    ap.add_argument("--num_cpus", type=int, default=4)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--hotword", action="append", default=[],
                    metavar="WORD[:BOOST]",
                    help="bias decoding toward WORD (repeatable; default "
                         "boost 4.0; needs --lm or enables host beam search)")
    ap.add_argument("--csv", help="per-utterance WER/confidence CSV output")
    ap.add_argument("--confidence", action="store_true",
                    help="also report CTC confidence scores")
    args = ap.parse_args()

    beam_decoder = None
    translator = AsrTranslator(args.model, lang=args.lang,
                               return_confidence=args.confidence)
    hotwords = {}
    for spec in args.hotword:
        word, _, boost = spec.partition(":")
        hotwords[word] = float(boost) if boost else 4.0
    if args.lm or hotwords:
        from lightning_asr_tpu.decoding.beam_search import BeamSearchDecoderWithLM

        beam_decoder = BeamSearchDecoderWithLM(
            translator.vocab.labels, beam_width=args.beam_width,
            alpha=args.alpha, beta=args.beta, lm_path=args.lm or None,
            num_cpus=args.num_cpus, hotwords=hotwords)
        translator.beam_decoder = beam_decoder
    elif args.device_beam:
        from lightning_asr_tpu.decoding import DeviceBeamSearchDecoder

        translator.beam_decoder = DeviceBeamSearchDecoder(
            translator.vocab.labels, beam_width=args.beam_width)

    if args.audio:
        if args.stream:
            import numpy as np

            from lightning_asr_tpu.data.audio import read_audio
            from lightning_asr_tpu.inference import StreamingTranscriber

            samples, sr = read_audio(args.audio, mono=True)
            st = StreamingTranscriber(
                translator, chunk_seconds=min(args.chunk_seconds, 8.0),
                overlap_seconds=min(args.overlap_seconds, 1.0))
            block = int(args.stream_block_seconds * sr)
            wave, last = np.asarray(samples[0]), ""
            for lo in range(0, wave.shape[0], block):
                part = st.feed(wave[lo: lo + block])
                if part != last:
                    print(f"[{(lo + block) / sr:6.1f}s] {part}", flush=True)
                    last = part
            print(st.finish())
        elif args.long:
            print(translator.translate_long(
                args.audio, chunk_seconds=args.chunk_seconds,
                overlap_seconds=args.overlap_seconds))
        else:
            print(translator.translate(args.audio))
    if args.manifest:
        result = translator.evaluate_manifest(
            args.manifest, batch_size=args.batch_size, csv_path=args.csv)
        print(result)
    if not args.audio and not args.manifest:
        ap.error("provide --audio and/or --manifest")


if __name__ == "__main__":
    main()
