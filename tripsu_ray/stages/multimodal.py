"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video travel as Arrow ``binary`` columns with a small typed
metadata header; decode / feature-extract runs as an actor-pool
``map_batches`` stage with SMALL batches (payloads are orders of magnitude
wider than text rows — batch_size × payload × concurrency must fit the
worker heap; these stages stay in ``batch_format="pyarrow"`` end to end
because binary columns don't round-trip pandas cleanly).

Real byte formats: AUDIO is fully real via the stdlib ``wave`` module
(:class:`WavAudioCodec` — decode slot ``decode="wav"``, exercised
unconditionally in tests); IMAGES decode real PNG/JPEG through the
import-guarded :class:`PILImageCodec` (``codec="pil"``); VIDEO has the
import-guarded :class:`PyAVVideoCodec` (``codec="pyav"``). Where the
libraries are absent (this sandbox: no Pillow/PyAV) the deterministic
:class:`FakePayloadCodec` synthetic format stays the tested default —
the Ray-side plumbing (schemas, actor signatures, batch sizing, output
layout) is identical either way.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
from ..sources import read_parquet_clean as _read_parquet_clean

FORMAT_FAKE = 1
FORMAT_FAKE_VIDEO = 2

# fake-video shape formulas (mirrored by the SQL oracle): frame dims are
# smaller than stills so the multi-frame payload stays narrow
VIDEO_MAX_FRAMES = 7


class FakePayloadCodec:
    """Deterministic stand-in codec for the sandbox (no PIL/ffmpeg here)."""

    @staticmethod
    def encode(doc_id: int, text: str) -> bytes:
        w = 16 + (doc_id % 48)
        h = 16 + (doc_id % 32)
        header = struct.pack("<HHHH", w, h, 3, FORMAT_FAKE)
        body = hashlib.sha256(text.encode("utf-8")).digest()
        reps = (w * h * 3) // len(body) + 1
        return header + (body * reps)[: w * h * 3]

    @staticmethod
    def decode(payload: bytes) -> tuple[int, int, int, np.ndarray]:
        w, h, c, fmt = struct.unpack("<HHHH", payload[:8])
        if fmt != FORMAT_FAKE:
            raise ValueError(f"unknown payload format tag {fmt}")
        pixels = np.frombuffer(payload[8 : 8 + w * h * c], dtype=np.uint8)
        return w, h, c, pixels

    @staticmethod
    def encode_video(doc_id: int, text: str) -> bytes:
        """Multi-frame payload: 10-byte header + n_frames × (w·h·c) bytes."""
        w = 8 + (doc_id % 24)
        h = 8 + (doc_id % 16)
        n_frames = 1 + (doc_id % VIDEO_MAX_FRAMES)
        header = struct.pack("<HHHHH", w, h, 3, FORMAT_FAKE_VIDEO, n_frames)
        body = hashlib.sha256(text.encode("utf-8")).digest()
        frame_len = w * h * 3
        reps = (frame_len * n_frames) // len(body) + 1
        return header + (body * reps)[: frame_len * n_frames]

    @staticmethod
    def decode_video(payload: bytes) -> tuple[int, int, int, int, np.ndarray]:
        w, h, c, fmt, n_frames = struct.unpack("<HHHHH", payload[:10])
        if fmt != FORMAT_FAKE_VIDEO:
            raise ValueError(f"unknown payload format tag {fmt}")
        frames = np.frombuffer(
            payload[10 : 10 + n_frames * w * h * c], dtype=np.uint8
        ).reshape(n_frames, h, w, c)
        return w, h, c, n_frames, frames


def resize_nearest(
    pixels: np.ndarray, w: int, h: int, c: int, max_side: int
) -> tuple[int, int, np.ndarray]:
    """Nearest-neighbor downscale so max(w,h) <= max_side (numpy gather —
    a REAL kernel, not a stub: the fake part is only the byte format)."""
    if max(w, h) <= max_side:
        return w, h, pixels
    ow = max(1, (w * max_side) // max(w, h))
    oh = max(1, (h * max_side) // max(w, h))
    img = pixels.reshape(h, w, c)
    yi = (np.arange(oh) * h) // oh
    xi = (np.arange(ow) * w) // ow
    return ow, oh, img[yi][:, xi].reshape(-1)


class RealImageCodec:
    """The production codec slot — requires an image library.

    :class:`PILImageCodec` is the shipped adapter (import-guarded; Pillow
    is absent in this sandbox, so the synthetic :class:`FakePayloadCodec`
    stays the tested default)."""

    @staticmethod
    def decode(payload: bytes):  # pragma: no cover - documented stub
        raise NotImplementedError(
            "real image decode needs PIL/opencv (not installed in this "
            "sandbox); use PILImageCodec (when Pillow is available) or plug "
            "a codec with decode(bytes) -> (w, h, c, ndarray) into "
            "ImageFeaturizer(codec=...)"
        )


class PILImageCodec:
    """Import-guarded Pillow adapter for the real-codec slot: decodes any
    PIL-supported byte format (PNG/JPEG/…) to the
    ``(w, h, c, flat uint8 pixels)`` contract every downstream kernel
    (histogram featurize, nearest resize, aHash) already consumes.

    Constructing it RAISES ImportError when Pillow is absent — actor-pool
    ``__init__`` is the right place for that failure (once per actor, not
    per batch), and callers keep :class:`FakePayloadCodec` as the default
    in environments without an image stack (this sandbox: the adapter is
    exercised by a skipped-if-absent test)."""

    def __init__(self):
        from PIL import Image  # ImportError here = codec unavailable

        self._Image = Image

    def decode(self, payload: bytes):
        import io

        img = self._Image.open(io.BytesIO(payload)).convert("RGB")
        w, h = img.size
        arr = np.asarray(img, dtype=np.uint8)
        return w, h, 3, arr.reshape(-1)


def resolve_codec(codec, *, need: str = "decode"):
    """Codec slot resolution for every media actor: ``None``/``"fake"`` →
    :class:`FakePayloadCodec`; ``"pil"`` → :class:`PILImageCodec`;
    ``"pyav"`` → :class:`PyAVVideoCodec` (each constructed HERE, i.e.
    inside the actor ``__init__`` that calls this — ImportError surfaces
    once per actor, not per batch); anything else is a duck-typed codec
    object. ``need`` names the method the calling slot requires
    ("decode" for image actors, "decode_video" for video actors) and is
    validated at construction — a wrong-slot codec (e.g. "pyav" in an
    image actor) must fail at actor init, never on the first batch."""
    if codec is None or codec == "fake":
        return FakePayloadCodec
    if codec == "pil":
        out = PILImageCodec()
    elif codec == "pyav":
        out = PyAVVideoCodec()
    else:
        out = codec
    if not callable(getattr(out, need, None)):
        raise TypeError(
            f"codec {codec!r} has no {need}() — wrong slot (image actors "
            f"need decode, video actors need decode_video)"
        )
    return out


def attach_fake_payloads(sf_dir: str):
    """documents → (doc_id, payload: binary) — the synthetic media corpus."""
    import ray.data

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def encode(batch: pa.Table) -> pa.Table:
        payloads = [
            FakePayloadCodec.encode(int(d), t)
            for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist())
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    return ds.map_batches(encode, batch_format="pyarrow")


class ImageFeaturizer:
    """Actor-pool stage: decode payload → (dims, 16-bin byte histogram).

    Codec/state loads once per actor in ``__init__`` (the real-codec slot is
    where a model or decoder init would live); ``__call__`` is per batch.
    """

    def __init__(self, codec=None):
        self.codec = resolve_codec(codec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, feats = [], [], []
        for payload in batch["payload"].to_pylist():
            w, h, c, pixels = self.codec.decode(payload)
            hist, _ = np.histogram(pixels, bins=16, range=(0, 256))
            total = max(1, hist.sum())
            widths.append(w)
            heights.append(h)
            feats.append(((hist / total).astype(np.float32), hist.astype(np.int64)))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "feature": pa.array(
                    [f.tolist() for f, _ in feats], pa.list_(pa.float32())
                ),
                # raw integer bin counts (the pre-normalization histogram):
                # the hash-checkable rendering of the same feature — the
                # float32 vector is for ML consumers, the counts for the
                # exact oracle (doc_oracle.sql_multimodal_features)
                "counts": pa.array(
                    [c.tolist() for _, c in feats], pa.list_(pa.int64())
                ),
            }
        )


def image_features(sf_dir: str, *, batch_size: int = 256, concurrency=(1, 4),
                   codec=None):
    """Full multimodal pipeline: attach payloads → actor-pool featurize.

    Small batch_size on purpose: payload rows are wide; see module doc.
    ``codec`` plumbs the actor codec slot (``"pil"`` for real images —
    see :func:`resolve_codec`).
    """
    return attach_fake_payloads(sf_dir).map_batches(
        ImageFeaturizer,
        fn_constructor_kwargs={"codec": codec},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


RESIZE_MAX_SIDE = 32


class ImageResizer:
    """Actor-pool stage: decode → nearest-neighbor downscale → re-encode.

    Output dims are pure integer arithmetic on the input dims, so
    ``multimodal_resize`` is DuckDB-oracle hash-matched end to end; the
    resized payload itself is carried (and its length checked) so the
    binary plumbing is exercised, with ``payload_bytes`` in the oracle.
    """

    def __init__(self, codec=None, max_side: int = RESIZE_MAX_SIDE):
        self.codec = resolve_codec(codec)
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        in_w, in_h, out_w, out_h, payloads = [], [], [], [], []
        for payload in batch["payload"].to_pylist():
            w, h, c, pixels = self.codec.decode(payload)
            ow, oh, out = resize_nearest(pixels, w, h, c, self.max_side)
            header = struct.pack("<HHHH", ow, oh, c, FORMAT_FAKE)
            in_w.append(w)
            in_h.append(h)
            out_w.append(ow)
            out_h.append(oh)
            payloads.append(header + out.tobytes())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "in_width": pa.array(in_w, pa.int32()),
                "in_height": pa.array(in_h, pa.int32()),
                "out_width": pa.array(out_w, pa.int32()),
                "out_height": pa.array(out_h, pa.int32()),
                "payload_bytes": pa.array(
                    [len(p) for p in payloads], pa.int64()
                ),
                "payload": pa.array(payloads, pa.binary()),
            }
        )


def image_resize(sf_dir: str, *, batch_size: int = 256, concurrency=(1, 4),
                 codec=None):
    return attach_fake_payloads(sf_dir).map_batches(
        ImageResizer,
        fn_constructor_kwargs={"codec": codec},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def attach_fake_videos(sf_dir: str):
    """documents → (doc_id, payload: binary multi-frame fake video)."""
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def encode(batch: pa.Table) -> pa.Table:
        payloads = [
            FakePayloadCodec.encode_video(int(d), t)
            for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist())
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    return ds.map_batches(encode, batch_format="pyarrow")


FRAME_STRIDE = 2


class VideoFrameSampler:
    """Actor-pool fanout stage: video payload → one row per sampled frame.

    Samples every ``stride``-th frame (0, stride, 2·stride, …) and re-encodes
    each as a single still payload — the canonical video→training-image
    pre-processing shape. Row fanout happens INSIDE the batch (Arrow table
    out with more rows than in), so the streaming executor sees it as a
    normal map_batches and block sizes stay bounded.
    """

    def __init__(self, codec=None, stride: int = FRAME_STRIDE):
        self.codec = resolve_codec(codec, need="decode_video")
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, frame_idxs, n_frames_col, frame_payloads = [], [], [], []
        for doc_id, payload in zip(
            batch["doc_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            w, h, c, n_frames, frames = self.codec.decode_video(payload)
            header = struct.pack("<HHHH", w, h, c, FORMAT_FAKE)
            for idx in range(0, n_frames, self.stride):
                doc_ids.append(doc_id)
                frame_idxs.append(idx)
                n_frames_col.append(n_frames)
                frame_payloads.append(header + frames[idx].tobytes())
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "frame_idx": pa.array(frame_idxs, pa.int32()),
                "n_frames": pa.array(n_frames_col, pa.int32()),
                "frame_bytes": pa.array(
                    [len(p) for p in frame_payloads], pa.int64()
                ),
                "payload": pa.array(frame_payloads, pa.binary()),
            }
        )


def video_frame_sample(sf_dir: str, *, batch_size: int = 256, concurrency=(1, 4)):
    return attach_fake_videos(sf_dir).map_batches(
        VideoFrameSampler,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# threshold for a "cut": mean per-byte |diff| across a frame boundary, in
# thousandths. Uniform-random byte pairs average ≈ 85.3/byte; identical
# frames score 0 — 40/byte splits the two regimes with wide margin.
SCENE_CUT_TAU_MILLI = 40_000


class SceneCutDetector:
    """Actor-pool stage: video payload → shot-boundary census.

    The real video-curation primitive (PySceneDetect's content detector
    shape): per consecutive-frame pair, the mean absolute per-byte
    difference; a boundary is a CUT when that mean crosses a threshold.
    All-integer — the per-pair sum of |b1−b2| is exact, and the threshold
    test is ``1000·sum ≥ tau_milli·frame_len`` so no division happens —
    which is what makes the DuckDB oracle replay bit-exact
    (``doc_oracle.sql_multimodal_scene_cuts`` regenerates the payload
    bytes from the sha256 formula and mirrors the integer test).

    Output per doc: (doc_id, n_frames, n_cuts, max_diff_milli) where
    max_diff_milli = max over boundaries of ``1000·sum // frame_len``
    (0 for single-frame videos).
    """

    def __init__(self, codec=None, tau_milli: int = SCENE_CUT_TAU_MILLI):
        self.codec = resolve_codec(codec, need="decode_video")
        self.tau_milli = tau_milli

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, nf_col, cuts_col, maxd_col = [], [], [], []
        for doc_id, payload in zip(
            batch["doc_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            w, h, c, n_frames, frames = self.codec.decode_video(payload)
            flat = frames.reshape(n_frames, -1).astype(np.int64)
            frame_len = flat.shape[1]
            if n_frames < 2:
                n_cuts, max_d = 0, 0
            else:
                sums = np.abs(flat[1:] - flat[:-1]).sum(axis=1)  # exact int
                n_cuts = int((1000 * sums >= self.tau_milli * frame_len).sum())
                max_d = int((1000 * sums.max()) // frame_len)
            doc_ids.append(doc_id)
            nf_col.append(n_frames)
            cuts_col.append(n_cuts)
            maxd_col.append(max_d)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_frames": pa.array(nf_col, pa.int64()),
                "n_cuts": pa.array(cuts_col, pa.int64()),
                "max_diff_milli": pa.array(maxd_col, pa.int64()),
            }
        )


def video_scene_cuts(sf_dir: str, *, batch_size: int = 256, concurrency=(1, 4)):
    """Shot-boundary census over the synthetic video corpus (actor pool —
    see :class:`SceneCutDetector`)."""
    return attach_fake_videos(sf_dir).map_batches(
        SceneCutDetector,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# --- audio ------------------------------------------------------------------

FORMAT_FAKE_AUDIO = 3
AUDIO_WINDOW = 256  # samples per RMS window


def encode_audio(doc_id: int, text: str) -> bytes:
    """Fake PCM16 mono payload: 8-byte header (rate, n_samples, tag) +
    deterministic int16 samples from sha256(text) (same honesty contract
    as the image codec: byte format fake, DSP kernels real)."""
    rate = 8000 * (1 + doc_id % 2)
    n_samples = 256 + doc_id % 4096
    header = struct.pack("<HIH", rate, n_samples, FORMAT_FAKE_AUDIO)
    body = hashlib.sha256(text.encode("utf-8")).digest()
    nbytes = n_samples * 2
    reps = nbytes // len(body) + 1
    return header + (body * reps)[:nbytes]


def decode_audio(payload: bytes) -> tuple[int, int, np.ndarray]:
    rate, n_samples, fmt = struct.unpack("<HIH", payload[:8])
    if fmt != FORMAT_FAKE_AUDIO:
        raise ValueError(f"unknown payload format tag {fmt}")
    pcm = np.frombuffer(payload[8 : 8 + n_samples * 2], dtype="<i2")
    return rate, n_samples, pcm


def rms_windows(pcm: np.ndarray, window: int = AUDIO_WINDOW) -> np.ndarray:
    """Windowed RMS energy — a REAL vectorized DSP kernel over the PCM
    buffer (zero-padded tail window), float32 per window."""
    n = len(pcm)
    n_win = (n + window - 1) // window
    padded = np.zeros(n_win * window, dtype=np.float64)
    padded[:n] = pcm.astype(np.float64)
    frames = padded.reshape(n_win, window)
    return np.sqrt((frames**2).mean(axis=1)).astype(np.float32)


def attach_fake_audio(sf_dir: str):
    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def encode(batch: pa.Table) -> pa.Table:
        payloads = [
            encode_audio(int(d), t)
            for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist())
        ]
        return pa.table(
            {"doc_id": batch["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    return ds.map_batches(encode, batch_format="pyarrow")


# VAD window deliberately NOT a multiple of the payload's 16-sample digest
# period (256 would make every full window identical): 250 % 16 = 10, so
# window energies cycle through 8 phases and real active/inactive RUNS
# appear. Threshold on the exact integer mean square (uniform int16 mean
# square ≈ 2³⁰/3 ≈ 3.58·10⁸).
VAD_WINDOW = 250
VAD_TAU_MEANSQ = 358_000_000


class VoiceActivityDetector:
    """Actor-pool stage: PCM payload → voice-activity segment census.

    The audio-curation primitive (webrtcvad's shape, energy-gated): window
    the PCM into ``window``-sample frames (zero-padded tail), mark a frame
    ACTIVE when its exact integer energy clears the mean-square threshold
    (``sum(x²) ≥ tau·window`` — division-free, ≤ 250·32768² ≈ 2.7·10¹¹
    per window, far inside int64), then reduce the boolean run-length
    structure: (n_windows, n_active, longest_run, first_active; -1 when
    silent). All-integer end to end → the DuckDB oracle
    (``doc_oracle.sql_multimodal_vad``) regenerates the samples from the
    sha256 tiling formula and replays it bit-exactly, with the run
    reduction as a gaps-and-islands window query."""

    def __init__(self, decode=None, window: int = VAD_WINDOW,
                 tau_meansq: int = VAD_TAU_MEANSQ):
        self.decode = resolve_audio_decode(decode)
        self.window = window
        self.tau = tau_meansq

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, nw_c, na_c, run_c, first_c = [], [], [], [], []
        for doc_id, payload in zip(
            batch["doc_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            rate, n_samples, pcm = self.decode(payload)
            w = self.window
            n_win = (n_samples + w - 1) // w
            padded = np.zeros(n_win * w, dtype=np.int64)
            padded[:n_samples] = pcm.astype(np.int64)
            energy = (padded.reshape(n_win, w) ** 2).sum(axis=1)  # exact
            active = energy >= self.tau * w
            n_active = int(active.sum())
            if n_active:
                # run lengths of consecutive True
                edges = np.flatnonzero(np.diff(np.concatenate(
                    ([False], active, [False])).astype(np.int8)))
                runs = edges[1::2] - edges[::2]
                longest = int(runs.max())
                first = int(np.argmax(active))
            else:
                longest, first = 0, -1
            ids.append(doc_id)
            nw_c.append(n_win)
            na_c.append(n_active)
            run_c.append(longest)
            first_c.append(first)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_windows": pa.array(nw_c, pa.int64()),
                "n_active": pa.array(na_c, pa.int64()),
                "longest_run": pa.array(run_c, pa.int64()),
                "first_active": pa.array(first_c, pa.int64()),
            }
        )


def audio_vad(sf_dir: str, *, batch_size: int = 256, concurrency=(1, 4),
              decode=None):
    """Voice-activity segment census over the synthetic audio corpus
    (actor pool — see :class:`VoiceActivityDetector`)."""
    return attach_fake_audio(sf_dir).map_batches(
        VoiceActivityDetector,
        fn_constructor_kwargs={"decode": decode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class WavAudioCodec:
    """REAL audio byte-format support via the stdlib ``wave`` module — no
    external dependency, so unlike the PIL/PyAV slots this adapter WORKS
    in the sandbox and is exercised unconditionally in tests. Decodes
    mono or multi-channel 16-bit PCM WAV bytes to the
    ``(rate, n_samples, int16 pcm)`` contract every audio kernel
    (windowed RMS, VAD energy gate) already consumes; multi-channel
    input is downmixed by exact integer-mean (sum // n_channels)."""

    def decode(self, payload: bytes):
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getsampwidth() != 2:
                raise ValueError(
                    f"WavAudioCodec supports 16-bit PCM only "
                    f"(got sampwidth={w.getsampwidth()})"
                )
            rate = w.getframerate()
            nch = w.getnchannels()
            n = w.getnframes()
            pcm = np.frombuffer(w.readframes(n), dtype="<i2")
        if nch > 1:
            pcm = (pcm.reshape(-1, nch).astype(np.int64).sum(axis=1)
                   // nch).astype("<i2")
        return rate, len(pcm), pcm

    @staticmethod
    def encode(rate: int, pcm: np.ndarray) -> bytes:
        """Mono 16-bit WAV bytes (test/round-trip helper)."""
        import io
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(np.asarray(pcm, dtype="<i2").tobytes())
        return buf.getvalue()


class PyAVVideoCodec:
    """Import-guarded PyAV adapter for the real-video slot (the PIL
    pattern): decodes any container/codec PyAV supports to the
    ``(w, h, c, n_frames, frames uint8[n,h,w,c])`` contract
    :class:`VideoFrameSampler` / :class:`SceneCutDetector` consume.
    Constructing it RAISES ImportError when PyAV is absent (this
    sandbox) — once per actor in ``__init__``, never per batch."""

    def __init__(self):
        import av  # ImportError here = codec unavailable

        self._av = av

    def decode_video(self, payload: bytes):
        import io

        frames = []
        with self._av.open(io.BytesIO(payload)) as container:
            for frame in container.decode(video=0):
                frames.append(frame.to_ndarray(format="rgb24"))
        if not frames:
            raise ValueError("no video frames decoded")
        arr = np.stack(frames)  # (n, h, w, 3)
        n, h, w, c = arr.shape
        return w, h, c, n, arr


def resolve_audio_decode(decode):
    """Audio decode-slot resolution: ``None``/``"fake"`` → the synthetic
    payload decoder; ``"wav"`` → a stdlib :class:`WavAudioCodec` bound
    method; callables pass through."""
    if decode is None or decode == "fake":
        return decode_audio
    if decode == "wav":
        return WavAudioCodec().decode
    return decode


class AudioFeaturizer:
    """Actor-pool stage: decode PCM → meta + windowed-RMS energy vector
    (decoder/model init once per actor; per-batch vectorized DSP)."""

    def __init__(self, decode=None, window: int = AUDIO_WINDOW):
        self.decode = resolve_audio_decode(decode)
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        rates, counts, durs, wins, energies = [], [], [], [], []
        for payload in batch["payload"].to_pylist():
            rate, n_samples, pcm = self.decode(payload)
            e = rms_windows(pcm, self.window)
            rates.append(rate)
            counts.append(n_samples)
            durs.append(n_samples * 1000 // rate)
            wins.append(len(e))
            energies.append(e.tolist())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sample_rate": pa.array(rates, pa.int32()),
                "n_samples": pa.array(counts, pa.int64()),
                "duration_ms": pa.array(durs, pa.int64()),
                "n_windows": pa.array(wins, pa.int64()),
                "energy": pa.array(energies, pa.list_(pa.float32())),
            }
        )


def audio_features(sf_dir: str, *, batch_size: int = 256, concurrency=(1, 4),
                   decode=None):
    return attach_fake_audio(sf_dir).map_batches(
        AudioFeaturizer,
        fn_constructor_kwargs={"decode": decode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# --- perceptual-hash image dedup --------------------------------------------


def ahash64(pixels: np.ndarray, w: int, h: int, c: int) -> int:
    """64-bit average hash (aHash) — a REAL perceptual-hash kernel:
    grayscale (channel sum) → fixed 8×8 nearest-neighbor grid → bit i =
    (cell i above the grid mean). The compare is EXACT integers
    (``64·s_i > Σ s_j`` — equal to the grayscale-mean form with no float
    division), so the DuckDB near-dup oracle replays every bit; identical
    payloads hash identically (honesty contract: only the byte format is
    fake)."""
    img = pixels.reshape(h, w, c).astype(np.int64).sum(axis=2)
    yi = (np.arange(8) * h) // 8
    xi = (np.arange(8) * w) // 8
    grid = img[yi][:, xi]
    bits = (64 * grid > grid.sum()).reshape(-1)
    return int(np.packbits(bits).view(">u8")[0])


def attach_content_payloads(sf_dir: str):
    """documents → (doc_id, payload) with dimensions derived from the
    CONTENT hash (not doc_id): duplicated source text yields bit-identical
    media — the shape real image-dedup corpora have (same file uploaded
    twice), which :func:`image_phash_dedup` exploits."""
    import hashlib as _hl

    import ray.data

    ds = _read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def encode(batch: pa.Table) -> pa.Table:
        payloads = []
        for t in batch["text"].to_pylist():
            digest = _hl.sha256(t.encode("utf-8")).digest()
            w = 16 + digest[0] % 48
            h = 16 + digest[1] % 32
            header = struct.pack("<HHHH", w, h, 3, FORMAT_FAKE)
            reps = (w * h * 3) // len(digest) + 1
            payloads.append(header + (digest * reps)[: w * h * 3])
        return pa.table(
            {"doc_id": batch["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    return ds.map_batches(encode, batch_format="pyarrow")


class PerceptualHasher:
    """Actor-pool stage: decode → aHash64 per image."""

    def __init__(self, codec=None):
        self.codec = resolve_codec(codec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = []
        for payload in batch["payload"].to_pylist():
            w, h, c, pixels = self.codec.decode(payload)
            hashes.append(ahash64(pixels, w, h, c))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "phash": pa.array(np.array(hashes, dtype=np.uint64).astype(np.int64)),
            }
        )


def image_phash_dedup(sf_dir: str, *, batch_size: int = 256, concurrency=(1, 4), num_partitions: int = 16, codec=None):
    """Image-level exact near-dup dedup: perceptual hash per image (actor
    pool), then one phash-keyed integer exchange groups identical hashes
    — (group representative doc_id, n_images) per cluster. On this
    deterministic corpus identical payloads ⟺ identical source text, so
    the DuckDB oracle groups by text and hash-matches (a 64-bit aHash
    collision between distinct texts has ~1e-14 probability on this
    corpus and the inputs are fixed — deterministic once green)."""
    import pandas as pd

    hashed = attach_content_payloads(sf_dir).map_batches(
        PerceptualHasher,
        fn_constructor_kwargs={"codec": codec},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def tag(batch: pa.Table) -> pa.Table:
        part = batch["phash"].to_numpy(zero_copy_only=False) % num_partitions
        return batch.append_column("_part", pa.array(part.astype(np.int64)))

    def census(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "n_images": pd.Series([], dtype="int64"),
            }
        )
        if not len(g) or "phash" not in g.columns:
            return empty
        agg = g.groupby("phash", sort=False)["doc_id"].agg(["min", "size"])
        return pd.DataFrame(
            {
                "doc_id": agg["min"].astype("int64").to_numpy(),
                "n_images": agg["size"].astype("int64").to_numpy(),
            }
        )

    return (
        hashed.map_batches(tag, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(census, batch_format="pandas")
    )


def image_phash_near_dup(
    sf_dir: str,
    *,
    max_hamming: int = 3,
    batch_size: int = 256,
    concurrency=(1, 4),
    num_partitions: int = 16,
    codec=None,
):
    """NEAR-duplicate image pairs by perceptual-hash Hamming distance —
    the banded-LSH scale plan for 64-bit aHashes: split each hash into
    ``max_hamming + 1`` bands (pigeonhole: any pair within ``max_hamming``
    bits shares at least one EXACT band), bucket-join per band, then
    verify candidates with an exact popcount rerank. Exact recall at the
    configured radius by construction; work is bucket-quadratic instead
    of corpus-quadratic.

    Output: (a, b, hamming) per unordered near-dup pair (a < b),
    globally distinct (a candidate pair can surface in several bands —
    deduped in the pair-keyed second exchange).
    """
    import pandas as pd

    hashed = attach_content_payloads(sf_dir).map_batches(
        PerceptualHasher,
        fn_constructor_kwargs={"codec": codec},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return phash_near_dup_pairs(
        hashed, max_hamming=max_hamming, num_partitions=num_partitions
    )


def phash_near_dup_pairs(hashed, *, max_hamming: int = 3, num_partitions: int = 16):
    """Core banded-Hamming join over a (doc_id, phash) Dataset — split out
    so tests can drive it with planted hashes."""
    import pandas as pd

    n_bands = max_hamming + 1
    band_bits = 64 // n_bands

    def band_rows(batch: pa.Table) -> pd.DataFrame:
        h = batch["phash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows = []
        for b in range(n_bands):
            key = (h >> np.uint64(b * band_bits)) & np.uint64((1 << band_bits) - 1)
            rows.append(pd.DataFrame({"band": np.int64(b), "key": key.astype(np.int64),
                                      "doc_id": d, "phash": h.astype(np.int64)}))
        out = pd.concat(rows, ignore_index=True)
        out["_part"] = (
            (out["band"] * 1_000_003 + out["key"]) % num_partitions
        ).astype("int64")
        return out

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"),
             "hamming": pd.Series([], dtype="int64"),
             "_p2": pd.Series([], dtype="int64")}
        )
        if not len(g):
            return empty
        g = g.drop_duplicates(["band", "key", "doc_id"])
        out = []
        for (_, _), grp in g.groupby(["band", "key"], sort=False):
            if len(grp) < 2:
                continue
            ids = grp["doc_id"].to_numpy(np.int64)
            hs = grp["phash"].to_numpy(np.int64).astype(np.uint64)
            order = np.argsort(ids)
            ids, hs = ids[order], hs[order]
            iu, ju = np.triu_indices(len(ids), k=1)
            x = hs[iu] ^ hs[ju]
            # vectorized popcount: one unpackbits over the raw bytes
            ham = (
                np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1)
                .sum(axis=1)
                .astype(np.int64)
                if len(x)
                else np.zeros(0, dtype=np.int64)
            )
            keep = ham <= max_hamming
            if keep.any():
                out.append(pd.DataFrame(
                    {"a": ids[iu[keep]], "b": ids[ju[keep]], "hamming": ham[keep]}
                ))
        if not out:
            return empty
        res = pd.concat(out, ignore_index=True)
        res["_p2"] = (
            (res["a"] * 1_000_003 + res["b"]) % num_partitions
        ).astype("int64")
        return res

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "a" not in g.columns:
            return pd.DataFrame(
                {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64"),
                 "hamming": pd.Series([], dtype="int64")}
            )
        return (
            g[["a", "b", "hamming"]]
            .drop_duplicates(["a", "b"])
            .reset_index(drop=True)
            .astype("int64")
        )

    return (
        hashed.map_batches(band_rows, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby("_p2")
        .map_groups(dedup, batch_format="pandas")
    )


def _phash_dup_flags(sf_dir: str, *, batch_size: int, concurrency,
                     num_partitions: int = 16):
    """(doc_id, dup_image) for EVERY doc via one phash-keyed exchange —
    dup = not the min-doc_id representative of its aHash cluster. Fully
    distributed: the cluster table never lands on the driver (distinct
    images are corpus-class at scale)."""
    import pandas as pd

    hashed = attach_content_payloads(sf_dir).map_batches(
        PerceptualHasher,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def tag(batch: pa.Table) -> pa.Table:
        part = batch["phash"].to_numpy(zero_copy_only=False) % num_partitions
        return batch.append_column("_part", pa.array(part.astype(np.int64)))

    def flags(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                              "dup_image": pd.Series([], dtype="int64")})
        if not len(g) or "phash" not in g.columns:
            return empty
        rep = g.groupby("phash")["doc_id"].transform("min")
        return pd.DataFrame(
            {"doc_id": g["doc_id"].astype("int64").to_numpy(),
             "dup_image": (g["doc_id"] != rep).astype("int64").to_numpy()}
        )

    return (
        hashed.map_batches(tag, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(flags, batch_format="pandas")
    )


def media_curate(sf_dir: str, *, batch_size: int = 256, concurrency=(1, 4)):
    """Multimodal curation capstone — the media analogue of
    ``text.text_curate``: one decision row per document composing the
    three media gates this module already computes, each a real
    curation criterion at 100 TB:

    - ``dup_image``   : the doc's image is a perceptual-hash duplicate
                        and NOT its cluster's representative (min doc_id
                        per aHash — the phash_dedup winner rule),
                        computed in a phash-keyed exchange (the cluster
                        table never lands on the driver);
    - ``static_video``: zero scene cuts (a multi-frame video whose
                        frames never change — stills masquerading as
                        video; single-frame videos are static by
                        definition);
    - ``silent_audio``: zero VAD-active windows.

    ``keep = 1`` iff none of the three flags fire. Three actor-pool map
    passes over the payload streams plus the phash exchange; the flag
    streams union-tag into ONE doc_id exchange that folds the decision
    row — everything integer, so the DuckDB oracle
    (``doc_oracle.sql_multimodal_curate``) composes the three existing
    byte-exact renderings and hash-matches end to end.

    Returns (doc_id, dup_image, static_video, silent_audio, keep).
    """
    import pandas as pd

    # each flag stream MATERIALIZES before the union: the three stages
    # are actor pools, and one fused execution would need all three
    # pools' minimum actors ALIVE simultaneously alongside the exchange
    # tasks — on a small CPU budget the streaming executor can deadlock
    # with every CPU held and pending actors that never start (observed:
    # 4/4 CPU, "{'CPU': 1.0}: 2+ pending" stall in the 4-CPU test
    # session). Sequential pool runs release their actors before the
    # next pool starts, and the materialized intermediates are flag rows
    # (doc_id + ints) — output-sized, never payload-sized.
    dup = _phash_dup_flags(
        sf_dir, batch_size=batch_size, concurrency=concurrency
    ).materialize()
    cuts = video_scene_cuts(
        sf_dir, batch_size=batch_size, concurrency=concurrency
    ).materialize()
    vad = audio_vad(
        sf_dir, batch_size=batch_size, concurrency=concurrency
    ).materialize()

    def dup_row(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b["doc_id"].astype("int64").to_numpy(),
             "dup_image": b["dup_image"].astype("int64").to_numpy(),
             "static_video": np.full(len(b), -1, dtype=np.int64),
             "silent_audio": np.full(len(b), -1, dtype=np.int64)}
        )

    def cut_row(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64").to_numpy(),
             "dup_image": np.full(len(df), -1, dtype=np.int64),
             "static_video": (df["n_cuts"] == 0).astype("int64").to_numpy(),
             "silent_audio": np.full(len(df), -1, dtype=np.int64)}
        )

    def vad_row(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64").to_numpy(),
             "dup_image": np.full(len(df), -1, dtype=np.int64),
             "static_video": np.full(len(df), -1, dtype=np.int64),
             "silent_audio": (df["n_active"] == 0).astype("int64").to_numpy()}
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("doc_id", "dup_image", "static_video",
                       "silent_audio", "keep")}
        )
        if not len(g) or "doc_id" not in g.columns:
            return empty
        agg = g.groupby("doc_id", as_index=False).max()  # -1 sentinels lose
        keep = ((agg["dup_image"] == 0) & (agg["static_video"] == 0)
                & (agg["silent_audio"] == 0)).astype("int64")
        return pd.DataFrame(
            {"doc_id": agg["doc_id"].astype("int64").to_numpy(),
             "dup_image": agg["dup_image"].astype("int64").to_numpy(),
             "static_video": agg["static_video"].astype("int64").to_numpy(),
             "silent_audio": agg["silent_audio"].astype("int64").to_numpy(),
             "keep": keep.to_numpy()}
        )

    flagged = (
        dup.map_batches(dup_row, batch_format="pandas")
        .union(cuts.map_batches(cut_row, batch_format="pyarrow"))
        .union(vad.map_batches(vad_row, batch_format="pyarrow"))
    )
    return flagged.groupby("doc_id").map_groups(fold, batch_format="pandas")
