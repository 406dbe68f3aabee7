"""Incremental (streaming) transcription on top of ``AsrTranslator``.

The reference has no streaming path at all (its inference surface is the
one-shot ``AsrTranslator.translate``, ``/root/reference/predict.py:31-74``);
this module goes beyond it for live-caption / dictation serving: feed PCM
as it arrives, read a stable partial transcript after every feed, and get
the final transcript at ``finish()``.

TPU-first design: every window runs through ONE jitted forward at a fixed
``(1, chunk)`` shape — the first window compiles, every later window (and
every later stream) reuses the executable.  Window placement and keep-region
stitching are EXACTLY ``plan_chunks``'s (``predict.py:42-67``): windows of
``chunk`` samples every ``chunk - 2*overlap``, each non-final window keeping
frames for samples ``[start+keep_lo, start+chunk-overlap)``, the final
right-aligned window keeping through the end — so ``finish()`` reproduces
``AsrTranslator.translate_long`` output for the same audio, and the
multi-window stitch test pins that equivalence.

Greedy CTC collapse is incremental: the collapse state (previous frame's
argmax token) carries across window boundaries, so each ``feed()`` does
O(new frames) host work and ``partial()`` is free.  With a beam decoder the
kept log-probs are buffered and decoded once at ``finish()`` (beam search is
not prefix-stable, so greedy serves the partials either way).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from ..decoding.greedy import greedy_decode_to_strings


class StreamingTranscriber:
    """Push-based transcription session over a fixed compiled window.

    Args:
      translator: a loaded ``AsrTranslator`` (mel path; SSL-feature
        checkpoints are rejected like ``translate_long``).
      chunk_seconds / overlap_seconds: window geometry, identical semantics
        to ``translate_long``.  ``chunk`` must exceed ``2*overlap``.

    Usage::

        st = StreamingTranscriber(translator)
        for block in microphone():     # arbitrary block sizes
            text_so_far = st.feed(block)
        final = st.finish()
    """

    def __init__(self, translator, chunk_seconds: float = 8.0,
                 overlap_seconds: float = 1.0):
        if translator.ssl_extractor is not None:
            raise NotImplementedError("streaming supports the mel path")
        sr = translator.frontend.sample_rate
        self.translator = translator
        self.chunk = int(chunk_seconds * sr)
        self.overlap = int(overlap_seconds * sr)
        if self.chunk <= 2 * self.overlap:
            raise ValueError(
                f"chunk ({self.chunk}) must exceed 2*overlap ({2 * self.overlap})")
        self.hop = self.chunk - 2 * self.overlap

        from ..ops.frontend import mel_num_frames

        self._mel_num_frames = lambda s: mel_num_frames(s, translator.frontend)
        self._T_mel = self._mel_num_frames(self.chunk)

        self._buf: List[np.ndarray] = []   # samples from _buf_start onward
        self._buf_start = 0                # absolute index of _buf[0][0]
        self._total = 0                    # absolute samples fed so far
        self._next_start = 0               # next window's absolute start
        self._keep_end = 0                 # absolute sample the stitch reached
        self._lp_pieces: List[np.ndarray] = []  # kept frames (beam finish)
        self._prev_tok = translator.vocab.blank_id  # greedy collapse state
        self._committed: List[str] = []
        self._finished: Optional[str] = None

    # ------------------------------------------------------------------
    def feed(self, samples: np.ndarray) -> str:
        """Append PCM samples; process every window that is now complete
        AND guaranteed non-final (a window is final only if the stream ends
        within it — unknowable until ``finish``, hence the strict >).
        Returns the current committed partial transcript."""
        if self._finished is not None:
            raise RuntimeError("stream already finished")
        samples = np.asarray(samples, np.float32).reshape(-1)
        if samples.size:
            self._buf.append(samples)
            self._total += samples.size
        while self._total > self._next_start + self.chunk:
            self._process_window(self._next_start, final=False)
            self._next_start += self.hop
            self._drop_consumed()
        return self.partial()

    def partial(self) -> str:
        """Transcript of all committed (stitch-stable) frames so far."""
        if self._finished is not None:
            return self._finished
        return "".join(self._committed)

    def finish(self) -> str:
        """Flush the final right-aligned window and return the transcript
        (beam-decoded over the full kept lattice when a beam decoder is
        attached, else the incremental greedy result)."""
        if self._finished is not None:
            return self._finished
        if self._total > self._keep_end:
            final_start = max(self._total - self.chunk, 0)
            self._process_window(final_start, final=True)
        if self.translator.beam_decoder is not None and self._lp_pieces:
            stitched = np.concatenate(self._lp_pieces, axis=0)[None]
            total = np.asarray([stitched.shape[1]], np.int32)
            self._finished = self.translator.beam_decoder.forward(
                stitched, total)[0]
        else:
            self._finished = "".join(self._committed)
        self._buf, self._lp_pieces = [], []
        return self._finished

    @property
    def samples_fed(self) -> int:
        return self._total

    # ------------------------------------------------------------------
    def _drop_consumed(self) -> None:
        """Free buffered samples no window will read again — keeps session
        memory O(chunk), not O(stream).  The bound is NOT ``_next_start``:
        the stream may end at any moment, and the final right-aligned window
        then starts at ``total - chunk``, which sits BEFORE ``_next_start``
        whenever the stream ends within ``2*overlap`` of a hop boundary —
        those samples must stay readable or ``finish()`` would compute the
        last window over silently zero-filled left context and diverge from
        ``translate_long``."""
        bound = min(self._next_start, max(self._total - self.chunk, 0))
        while self._buf and \
                self._buf_start + self._buf[0].size <= bound:
            self._buf_start += self._buf[0].size
            self._buf.pop(0)

    def _window_samples(self, start: int) -> np.ndarray:
        """Zero-padded (chunk,) view of absolute samples [start, start+chunk)."""
        assert start >= self._buf_start, (
            f"window start {start} reads samples already freed "
            f"(buffer begins at {self._buf_start}) — _drop_consumed bound bug")
        out = np.zeros(self.chunk, np.float32)
        pos = self._buf_start
        for piece in self._buf:
            lo = max(start, pos)
            hi = min(start + self.chunk, pos + piece.size)
            if hi > lo:
                out[lo - start : hi - start] = piece[lo - pos : hi - pos]
            pos += piece.size
            if pos >= start + self.chunk:
                break
        return out

    def _out_frame(self, s: int, frames: int) -> int:
        """Output frames a keep-prefix of ``s`` window samples produces —
        the model's exact length function, as in ``translate_long``."""
        if s <= 0:
            return 0
        return min(frames, frames * self._mel_num_frames(s) // self._T_mel)

    def _process_window(self, start: int, final: bool) -> None:
        tr = self.translator
        wave = self._window_samples(start)
        n_valid = min(self._total, start + self.chunk) - start
        log_probs, out_lens = tr._jit_forward(
            jnp.asarray(wave[None]), jnp.asarray(np.asarray([n_valid], np.int32)))
        frames = int(np.asarray(out_lens)[0])
        keep_lo = self._keep_end - start          # 0 for the first window
        keep_hi = (self._total - start) if final else (self.chunk - self.overlap)
        f_lo = self._out_frame(keep_lo, frames)
        f_hi = max(self._out_frame(keep_hi, frames), f_lo)
        lp = np.asarray(log_probs, np.float32)[0, f_lo:f_hi]
        self._keep_end = start + keep_hi
        if tr.beam_decoder is not None:
            self._lp_pieces.append(lp)
        # incremental greedy CTC collapse (repeat-collapse + blank-drop),
        # carrying the previous frame's token across windows
        toks = np.argmax(lp, axis=-1) if lp.size else np.zeros(0, np.int64)
        blank, labels = tr.vocab.blank_id, tr.vocab.labels
        prev = self._prev_tok
        for t in toks:
            if t != blank and t != prev:
                self._committed.append(labels[int(t)])
            prev = int(t)
        self._prev_tok = prev
