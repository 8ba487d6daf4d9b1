"""Input pipeline: per-utterance records -> bucketed, padded, static-shape
batches.

Behavioral parity with the reference's tf.data pipelines
(reference: datasets/codes/dataset.py:101-402, datasets/vctk/dataset.py:99-357,
datasets/ljspeech/dataset.py, datasets/codes_siwis/dataset.py):

* source selection (char ids vs flite phone ids, hp.source == 'phone')
* codes targets: done flag [0...0,1], unit loss masks, zero padding values,
  done padded with 1, masks padded with 0
* mel targets: per-channel normalization (mel - avg)/stddev, r head/tail
  silence frames at silence_mel_level_db, length padded to a multiple of r
* filtering of utterances longer than max_iters * r
* length-bucketed batching

TPU-first difference: the reference's ``group_by_window`` pads each batch to
the longest element in the window — every batch has a fresh shape and XLA
would recompile per batch.  Here each bucket has a FIXED pad length (its
upper boundary) and source lengths are quantized, so there is exactly one
compiled program per bucket.  (The reference's ``key_func`` also computes
``min(length - approx_min, 0)`` where ``max`` was clearly intended
(reference: datasets/codes/dataset.py:309), collapsing all long utterances
into one bucket; we implement the intended bucketing.)

The reader uses the C++ fast path when built (``native_reader``), falling
back to the pure-Python codec.
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Callable, Iterator, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from ..config import HParams
from . import records as R
from .tfrecord import read_examples


class UtteranceMeta(NamedTuple):
    id: int
    key: str
    text: str
    lang: str = ""


class Utterance(NamedTuple):
    meta: UtteranceMeta
    source: np.ndarray           # (T_in,) int
    source_length: int
    speaker_id: int
    age: int
    gender: int
    accent_type: Optional[np.ndarray]
    target: Optional[np.ndarray]          # (T, C) or None
    target2: Optional[np.ndarray]         # lf0 for mgclf0
    target_length: int
    done: Optional[np.ndarray]
    spec_loss_mask: Optional[np.ndarray]
    binary_loss_mask: Optional[np.ndarray]


class NumpyBatch(NamedTuple):
    meta: List[UtteranceMeta]
    source: np.ndarray
    source_length: np.ndarray
    speaker_id: np.ndarray
    accent_type: Optional[np.ndarray]
    target: Optional[np.ndarray]
    target2: Optional[np.ndarray]
    target_length: np.ndarray
    done: Optional[np.ndarray]
    spec_loss_mask: Optional[np.ndarray]
    binary_loss_mask: Optional[np.ndarray]


# ------------------------------------------------------------ record loading

def _read_example(path: str) -> dict:
    try:
        from .native_reader import read_examples_native
        return next(iter(read_examples_native(path)))
    except Exception:
        return next(iter(read_examples(path)))


def load_utterance(source_file: str, target_file: Optional[str],
                   hp: HParams, target_kind: str) -> Utterance:
    src = R.parse_source_record(_read_example(source_file))
    use_phone = hp.source == "phone" and src.phone is not None
    source = src.phone if use_phone else src.source
    source_length = src.phone_length if use_phone else src.source_length
    text = src.phone_txt if use_phone else src.text
    meta = UtteranceMeta(src.id, src.key, text, src.lang)

    target = target2 = done = spec_mask = binary_mask = None
    target_length = 0
    if target_file is not None:
        r = hp.outputs_per_step
        if target_kind == "codes":
            tgt = R.parse_code_target_record(_read_example(target_file))
            # reference: datasets/codes/dataset.py:158-232
            target = tgt.codes.astype(np.float32)
            target_length = tgt.codes_length * r
            steps = target_length // r
            done = np.concatenate([np.zeros(steps - 1, np.float32),
                                   np.ones(1, np.float32)])
            spec_mask = np.ones(target_length, np.float32)
            binary_mask = np.ones(steps, np.float32)
        elif target_kind == "mel":
            tgt = R.parse_mel_target_record(_read_example(target_file))
            # reference: datasets/vctk/dataset.py:152-193
            avg = np.asarray(hp.average_mel_level_db, np.float32)
            std = np.asarray(hp.stddev_mel_level_db, np.float32)
            mel = (tgt.mel - avg) / std
            sil = np.float32(hp.silence_mel_level_db)
            mel = np.pad(mel, ((r, r), (0, 0)), constant_values=sil)
            target_length = tgt.target_length + 2 * r
            if target_length % r:
                padded = (target_length // r + 1) * r
                mel = np.pad(mel, ((0, padded - target_length), (0, 0)),
                             constant_values=sil)
                target_length = padded
            target = mel.astype(np.float32)
            steps = target_length // r
            done = np.concatenate([np.zeros(steps - 1, np.float32),
                                   np.ones(1, np.float32)])
            spec_mask = np.ones(target_length, np.float32)
            binary_mask = np.ones(steps, np.float32)
        elif target_kind == "mgclf0":
            tgt = R.parse_mgc_lf0_target_record(_read_example(target_file))
            target = tgt.mgc.astype(np.float32)
            lf0 = tgt.lf0
            # quantize lf0 into num_lf0s classes over [f0_min, f0_max] in log
            lo, hi = np.log(hp.f0_min), np.log(hp.f0_max)
            voiced = lf0 > 0
            idx = np.zeros(len(lf0), np.int64)
            safe = np.clip(np.log(np.maximum(lf0, 1e-8)), lo, hi)
            idx[voiced] = 1 + np.floor(
                (safe[voiced] - lo) / (hi - lo) * (hp.num_lf0s - 2)
            ).astype(np.int64)
            target2 = np.eye(hp.num_lf0s, dtype=np.float32)[idx]
            target_length = tgt.target_length * r
            steps = max(target_length // r, 1)
            done = np.concatenate([np.zeros(steps - 1, np.float32),
                                   np.ones(1, np.float32)])
            spec_mask = np.ones(target_length, np.float32)
            binary_mask = np.ones(steps, np.float32)
        else:
            raise ValueError(target_kind)

    accent = None
    if hp.use_accent_type:
        # accent ids travel in the source sequence domain (reference:
        # hparams.py:55-62); corpora whose source records carry them use the
        # recorded ids, others fall back to the unknown accent id.  The
        # recorded ids follow the chosen source stream (char vs phone).
        if src.accent_type is not None and len(src.accent_type) > 0:
            rec_accent = np.asarray(src.accent_type, np.int64)
            if len(rec_accent) >= source_length:
                accent = rec_accent[:source_length]
            else:  # pad short annotation streams with the unknown id
                accent = np.full(source_length, hp.accent_type_unknown,
                                 np.int64)
                accent[:len(rec_accent)] = rec_accent
        else:
            accent = np.full(source_length, hp.accent_type_unknown, np.int64)

    return Utterance(meta=meta, source=np.asarray(source, np.int64),
                     source_length=int(source_length),
                     speaker_id=src.speaker_id, age=src.age,
                     gender=src.gender, accent_type=accent, target=target,
                     target2=target2, target_length=int(target_length),
                     done=done, spec_loss_mask=spec_mask,
                     binary_loss_mask=binary_mask)


# ----------------------------------------------------------------- bucketing

def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class Bucketing:
    """Static-shape bucket table: bucket i pads targets to its upper edge."""

    def __init__(self, hp: HParams, source_width: int = 32):
        self.min_len = hp.approx_min_target_length
        self.width = hp.batch_bucket_width
        self.num_buckets = hp.batch_num_buckets
        self.r = hp.outputs_per_step
        self.source_width = source_width

    def bucket_id(self, target_length: int) -> int:
        over = max(target_length - self.min_len, 0)
        return min(self.num_buckets, over // self.width)

    def target_pad_length(self, bucket_id: int) -> int:
        edge = self.min_len + (bucket_id + 1) * self.width
        return _round_up(edge, self.r)

    def source_pad_length(self, max_source: int) -> int:
        return _round_up(max_source, self.source_width)


def pad_batch(utts: Sequence[Utterance], hp: HParams, target_kind: str,
              target_pad: Optional[int] = None,
              source_pad: Optional[int] = None) -> NumpyBatch:
    """Pad a list of utterances to common (static) shapes.

    Padding values follow the reference's padded_batch values
    (reference: datasets/codes/dataset.py:337-357): sources 0, codes 0.0,
    mel silence_mel_level_db, done 1, masks 0.
    """
    B = len(utts)
    r = hp.outputs_per_step
    src_len = max(u.source_length for u in utts)
    src_pad = source_pad or src_len
    src_pad = max(src_pad, src_len)
    source = np.zeros((B, src_pad), np.int64)
    accent = (np.full((B, src_pad), hp.accent_type_unknown, np.int64)
              if hp.use_accent_type else None)
    for i, u in enumerate(utts):
        source[i, :u.source_length] = u.source[:u.source_length]
        if accent is not None and u.accent_type is not None:
            accent[i, :u.source_length] = u.accent_type[:u.source_length]

    has_target = utts[0].target is not None
    target = target2 = done = spec_mask = binary_mask = None
    if has_target:
        tgt_len = max(u.target_length for u in utts)
        tgt_pad = max(target_pad or tgt_len, tgt_len)
        tgt_pad = _round_up(tgt_pad, r)
        C = utts[0].target.shape[1]
        fill = (np.float32(hp.silence_mel_level_db)
                if target_kind == "mel" else np.float32(0.0))
        target = np.full((B, tgt_pad, C), fill, np.float32)
        if utts[0].target2 is not None:
            C2 = utts[0].target2.shape[1]
            target2 = np.zeros((B, tgt_pad, C2), np.float32)
        steps = tgt_pad // r
        done = np.ones((B, steps), np.float32)
        spec_mask = np.zeros((B, tgt_pad), np.float32)
        binary_mask = np.zeros((B, steps), np.float32)
        for i, u in enumerate(utts):
            L = u.target_length
            target[i, :L] = u.target
            if target2 is not None:
                target2[i, :L] = u.target2
            s = L // r
            done[i, :s] = u.done
            spec_mask[i, :L] = u.spec_loss_mask
            binary_mask[i, :s] = u.binary_loss_mask

    return NumpyBatch(
        meta=[u.meta for u in utts], source=source,
        source_length=np.asarray([u.source_length for u in utts], np.int32),
        speaker_id=np.asarray([u.speaker_id for u in utts], np.int32),
        accent_type=accent, target=target, target2=target2,
        target_length=np.asarray([u.target_length for u in utts], np.int32),
        done=done, spec_loss_mask=spec_mask, binary_loss_mask=binary_mask)


# ------------------------------------------------------------------ pipeline

class Dataset:
    """Reference-pipeline equivalent with static-shape bucketed batching.

    DatasetSource.prepare_and_zip().filter_by_max_output_length()
      .repeat().shuffle().group_by_batch()   (reference: train.py:39-54)
    """

    def __init__(self, source_files: Sequence[str],
                 target_files: Optional[Sequence[str]], hp: HParams,
                 target_kind: str = "codes", batch_size: Optional[int] = None,
                 shuffle: bool = True, repeat: bool = False, seed: int = 0,
                 drop_remainder: bool = False, num_workers: int = 0,
                 fixed_target_pad: Optional[int] = None,
                 fixed_source_pad: Optional[int] = None,
                 bucket_schedule_seed: Optional[int] = None,
                 bucket_weights: Optional[Sequence[float]] = None,
                 bucket_buffer_cap: int = 4096):
        assert target_files is None or len(source_files) == len(target_files)
        self.pairs = list(zip(source_files,
                              target_files or [None] * len(source_files)))
        self.hp = hp
        self.target_kind = target_kind
        self.batch_size = batch_size or hp.batch_size
        self.shuffle = shuffle
        self.repeat = repeat
        self.seed = seed
        self.drop_remainder = drop_remainder
        # multi-host lockstep: every host must emit identical batch shapes.
        # Either ONE fixed pad (fixed_target_pad), or — much less padding
        # waste — a deterministic shared BUCKET SCHEDULE: every host draws
        # the same per-step bucket sequence from ``bucket_schedule_seed``
        # (the COMMON config seed, not the per-host data seed) and fills
        # the scheduled bucket from its own shard, so shapes stay in
        # lockstep while keeping per-bucket compiled programs
        # (reference bucketing semantics: datasets/codes/dataset.py:302-362)
        self.fixed_target_pad = fixed_target_pad
        self.fixed_source_pad = fixed_source_pad
        self.bucket_schedule_seed = bucket_schedule_seed
        self.bucket_weights = (list(bucket_weights)
                               if bucket_weights else None)
        self.bucket_buffer_cap = bucket_buffer_cap
        self.bucketing = Bucketing(hp)
        if num_workers <= 0:
            import os
            factor = hp.interleave_cycle_length_cpu_factor
            n = int((os.cpu_count() or 4) * factor)
            num_workers = min(max(n, hp.interleave_cycle_length_min),
                              hp.interleave_cycle_length_max)
        self.num_workers = num_workers

    def _utterances(self) -> Iterator[Utterance]:
        """Decode utterances with a bounded in-flight window.

        A bounded deque of <= 2*num_workers pending futures replaces
        submit-everything: a slow consumer holds at most the window in host
        RAM instead of the whole corpus, while FIFO consumption keeps the
        (shuffled) epoch order deterministic.  Matches the reference's
        ``parallel_interleave`` semantics — bounded parallel reads, ordered
        stream (reference: datasets/codes/dataset.py:126-135).
        """
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor
        rng = random.Random(self.seed)
        window = max(2 * self.num_workers, 1)
        epoch = 0
        while True:
            pairs = list(self.pairs)
            if self.shuffle:
                rng.shuffle(pairs)
            max_out = self.hp.max_iters * self.hp.outputs_per_step
            with ThreadPoolExecutor(self.num_workers) as pool:
                it = iter(pairs)
                pending: deque = deque()
                for s, t in pairs[:window]:
                    next(it)
                    pending.append(pool.submit(load_utterance, s, t, self.hp,
                                               self.target_kind))
                while pending:
                    u = pending.popleft().result()
                    nxt = next(it, None)
                    if nxt is not None:
                        pending.append(pool.submit(load_utterance, nxt[0],
                                                   nxt[1], self.hp,
                                                   self.target_kind))
                    # reference: filter_by_max_output_length
                    # (datasets/codes/dataset.py:264-269)
                    if u.target is not None and u.target_length > max_out:
                        continue
                    yield u
            epoch += 1
            if not self.repeat:
                return

    def _pads_for(self, bid: int, batch: Sequence[Utterance]
                  ) -> Tuple[int, int]:
        tp = (self.fixed_target_pad if self.fixed_target_pad
              else self.bucketing.target_pad_length(bid))
        sp = (self.fixed_source_pad if self.fixed_source_pad
              else self.bucketing.source_pad_length(
                  max(x.source_length for x in batch)))
        return tp, sp

    def _fits_fixed_pads(self, u: Utterance) -> bool:
        if (self.fixed_source_pad
                and u.source_length > self.fixed_source_pad):
            import logging
            logging.getLogger(__name__).warning(
                "skipping %s: source length %d > fixed pad %d",
                u.meta.key, u.source_length, self.fixed_source_pad)
            return False
        if (self.fixed_target_pad and u.target is not None
                and u.target_length > self.fixed_target_pad):
            import logging
            logging.getLogger(__name__).warning(
                "skipping %s: target length %d > fixed pad %d",
                u.meta.key, u.target_length, self.fixed_target_pad)
            return False
        return True

    def _iter_scheduled(self) -> Iterator[NumpyBatch]:
        """Shared-bucket-schedule batching for multi-host lockstep.

        Each scheduled entry names a bucket id; the batch is filled with
        buffered utterances from that bucket or below (largest first, so
        the extra padding stays minimal).  Requires every host's shard to
        contain utterances at or below each scheduled bucket — the buffer
        cap turns a starving schedule into a hard error instead of
        unbounded memory growth."""
        rng = random.Random(self.bucket_schedule_seed)
        bk = self.bucketing
        max_out = self.hp.max_iters * self.hp.outputs_per_step
        ids = [b for b in range(bk.num_buckets + 1)
               if bk.target_pad_length(b) <= max_out
               or b == 0]
        weights = self.bucket_weights or [1.0] * len(ids)
        assert len(weights) == len(ids), \
            (f"multihost_bucket_weights needs {len(ids)} entries "
             f"(one per bucket), got {len(weights)}")
        if self.fixed_source_pad is None:
            import logging
            logging.getLogger(__name__).warning(
                "bucket schedule without fixed_source_pad: source shapes "
                "are data-dependent and will NOT be in cross-host lockstep")
        stream = self._utterances()
        buckets: dict = {}
        buffered = 0
        while True:
            b = rng.choices(ids, weights)[0]
            batch = []
            drained = False
            while len(batch) < self.batch_size:
                took = False
                for bid in range(b, -1, -1):
                    q = buckets.get(bid)
                    if q:
                        batch.append(q.pop())
                        buffered -= 1
                        took = True
                        break
                if took:
                    continue
                u = next(stream, None)
                if u is None:
                    drained = True
                    break
                if u.target is None or not self._fits_fixed_pads(u):
                    continue
                buckets.setdefault(bk.bucket_id(u.target_length),
                                   []).append(u)
                buffered += 1
                if buffered > self.bucket_buffer_cap:
                    raise RuntimeError(
                        "bucket-schedule starvation: buffered "
                        f"{buffered} utterances without filling bucket {b} "
                        f"(pad {bk.target_pad_length(b)}); this host's "
                        "shard has no utterances that short — set "
                        "multihost_bucket_weights to skip short buckets or "
                        "fall back to multihost_target_pad_length")
            if drained:
                return  # finite stream exhausted (repeat=False)
            sp = (self.fixed_source_pad
                  or bk.source_pad_length(
                      max(x.source_length for x in batch)))
            yield pad_batch(batch, self.hp, self.target_kind,
                            bk.target_pad_length(b), sp)

    def __iter__(self) -> Iterator[NumpyBatch]:
        if self.bucket_schedule_seed is not None:
            yield from self._iter_scheduled()
            return
        buckets: dict = {}
        for u in self._utterances():
            if not self._fits_fixed_pads(u):
                continue
            if u.target is None:
                # quantize source pads so predict compiles once per size class
                yield pad_batch([u], self.hp, self.target_kind,
                                source_pad=(
                                    self.fixed_source_pad
                                    or self.bucketing.source_pad_length(
                                        u.source_length)))
                continue
            bid = self.bucketing.bucket_id(u.target_length)
            buckets.setdefault(bid, []).append(u)
            if len(buckets[bid]) == self.batch_size:
                batch = buckets.pop(bid)
                yield pad_batch(batch, self.hp, self.target_kind,
                                *self._pads_for(bid, batch))
        if not self.drop_remainder:
            for bid, batch in sorted(buckets.items()):
                if batch:
                    yield pad_batch(batch, self.hp, self.target_kind,
                                    *self._pads_for(bid, batch))

    def prefetch(self, buffer_size: Optional[int] = None
                 ) -> Iterator[NumpyBatch]:
        """Background-thread prefetching (reference: prefetch_buffer_size,
        hparams.py:181)."""
        buffer_size = buffer_size or self.hp.prefetch_buffer_size
        q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
        stop = object()

        def worker():
            try:
                for batch in self:
                    q.put(batch)
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                return
            yield item


def to_model_batch(nb: NumpyBatch):
    """NumpyBatch -> models.Batch (device-ready pytree)."""
    from ..models.tacotron import Batch
    target = nb.target
    if nb.target2 is not None:
        target = (nb.target, nb.target2)
    return Batch(source=nb.source.astype(np.int32),
                 source_length=nb.source_length,
                 target=target, target_length=nb.target_length,
                 done=nb.done, spec_loss_mask=nb.spec_loss_mask,
                 binary_loss_mask=nb.binary_loss_mask,
                 speaker_id=nb.speaker_id,
                 accent_type=(nb.accent_type.astype(np.int32)
                              if nb.accent_type is not None else None))


def pad_model_batch_rows(mb, multiple: int):
    """Pad a model Batch's rows up to a multiple of ``multiple``.

    Padded rows repeat the last real row but with ZEROED loss masks, so they
    contribute nothing to any loss or gradient (every loss in ``ops/losses``
    normalizes by the mask sum).  This lets a remainder batch shard over the
    device mesh instead of being silently dropped.  Returns
    ``(padded_batch, n_padded_rows)``.
    """
    import jax

    B = mb.source.shape[0]
    pad = (-B) % multiple
    if pad == 0:
        return mb, 0

    def pad_rows(x):
        x = np.asarray(x)
        return np.concatenate([x, np.repeat(x[-1:], pad, axis=0)], axis=0)

    padded = jax.tree_util.tree_map(pad_rows, mb)
    def zero_tail(mask):
        if mask is None:
            return None
        mask = mask.copy()
        mask[B:] = 0.0
        return mask
    padded = padded._replace(
        spec_loss_mask=zero_tail(padded.spec_loss_mask),
        binary_loss_mask=zero_tail(padded.binary_loss_mask))
    return padded, pad


def find_dataset_files(data_root: str, key_list: Sequence[str],
                       extension: str) -> List[str]:
    """<root>/<key>.<extension> for each selected key
    (reference: train.py:42-47 corpus file naming)."""
    import os
    return [os.path.join(data_root, f"{key}.{extension}") for key in key_list]


def load_key_list(path: str) -> List[str]:
    """reference: train.py:117-123."""
    with open(path) as f:
        return [line.rstrip("\n") for line in f if line.strip()]


def dataset_factory(source_files, target_files, hp: HParams,
                    **kwargs) -> Dataset:
    """Name-keyed dispatch (reference: datasets/dataset_factory.py:15-32).

    hp.dataset values: codes.dataset.DatasetSource,
    codes_siwis.dataset.DatasetSource, vctk.dataset.DatasetSource,
    ljspeech.dataset.DatasetSource, mgclf0 variants.
    """
    kind = kwargs.pop("target_kind", None)
    if kind is None:
        name = hp.dataset.lower()
        if "codes" in name:
            kind = "codes"
        elif "mgc" in name or "lf0" in name:
            kind = "mgclf0"
        else:
            kind = "mel"  # vctk / ljspeech mel targets
    return Dataset(source_files, target_files, hp, target_kind=kind, **kwargs)
