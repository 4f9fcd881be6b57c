"""Multimodal plumbing tests (SURVEY.md §2 / system-prompt scope).

Codecs are stubbed (decoder="fake") — what's under test is the REAL Ray
side: schema, actor-pool stage signatures, batch sizing, deterministic
output layout, and the explode shape of frame sampling.
"""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def media(ray_session):
    from information_extraction_system_ray.stages.multimodal import synth_media

    return synth_media(48)


def test_media_schema(media):
    from information_extraction_system_ray.stages.multimodal import MEDIA_SCHEMA

    t = pa.Table.from_pandas(media.to_pandas(), schema=MEDIA_SCHEMA)
    assert t.schema.equals(MEDIA_SCHEMA)


def test_decode_images_layout_and_determinism(media):
    from information_extraction_system_ray.stages.multimodal import decode_images

    out = decode_images(media, size=32, batch_size=16).to_pandas()
    assert list(out.columns) == ["media_id", "feature"]
    assert len(out) == media.count()
    feats = np.stack([np.asarray(f, np.float32) for f in out["feature"]])
    assert feats.shape == (48, 64)
    assert ((feats >= 0.0) & (feats <= 1.0)).all()

    # deterministic across runs and across batch sizes (block-order free)
    out2 = decode_images(media, size=32, batch_size=5).to_pandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    assert (np.stack(a["feature"].map(np.asarray))
            == np.stack(b["feature"].map(np.asarray))).all()


def test_sample_frames_explode(media):
    from information_extraction_system_ray.stages.multimodal import sample_frames

    out = sample_frames(media, every_ms=1000).to_pandas()
    assert list(out.columns) == ["media_id", "frame_ms", "frame_key"]
    # one row per sampled frame, frame count = ceil(duration/1000) per media
    durs = media.to_pandas().set_index("media_id")["duration_ms"]
    counts = out.groupby("media_id").size()
    for mid, n in counts.items():
        assert n == max(int(durs[mid]), 1) // 1000 + (
            1 if max(int(durs[mid]), 1) % 1000 else 0)
    # frame keys deterministic: same media+ts ⇒ same key
    out2 = sample_frames(media, every_ms=1000).to_pandas()
    k1 = out.sort_values(["media_id", "frame_ms"])["frame_key"].tolist()
    k2 = out2.sort_values(["media_id", "frame_ms"])["frame_key"].tolist()
    assert k1 == k2


def test_decode_audio_layout(media):
    from information_extraction_system_ray.stages.multimodal import decode_audio

    out = decode_audio(media, n_mels=16, hop_ms=250).to_pandas()
    assert list(out.columns) == ["media_id", "n_frames", "mel"]
    assert len(out) == media.count()
    durs = media.to_pandas().set_index("media_id")["duration_ms"]
    for _, r in out.iterrows():
        want = min(32, max(1, int(durs[r["media_id"]]) // 250))
        assert r["n_frames"] == want
        assert len(r["mel"]) == 16 * want
    # deterministic across runs
    out2 = decode_audio(media, n_mels=16, hop_ms=250).to_pandas()
    a = out.sort_values("media_id")["mel"].map(tuple).tolist()
    b = out2.sort_values("media_id")["mel"].map(tuple).tolist()
    assert a == b


def test_unknown_decoder_rejected(media):
    from information_extraction_system_ray.stages.multimodal import (
        DecodeAudio, DecodeImage, SampleFrames)

    with pytest.raises(ValueError):
        DecodeImage(decoder="libjpeg")
    with pytest.raises(ValueError):
        SampleFrames(decoder="ffmpeg")
    with pytest.raises(ValueError):
        DecodeAudio(decoder="librosa")


def test_scene_cuts_match_planted(ray_session):
    """media_scene_cuts plants segment boundaries by construction; the
    exact-integer detector must recover every one (palette bases are
    100+ levels apart; within-segment jitter is ~2 levels — see the
    synthesis comment in queries.py)."""
    from information_extraction_system_ray.queries import media_scene_cuts

    out = media_scene_cuts("/root/testdata/sf0.001")
    assert list(out.columns) == ["media_id", "n_frames", "n_cuts",
                                 "cut_idxs"]
    for i in range(len(out)):
        mid = int(out.iloc[i]["media_id"])
        n_seg = 2 + mid % 3
        cuts, pos = [], 0
        for seg in range(n_seg):
            if seg:
                cuts.append(pos)
            pos += 3 + (mid + seg) % 3
        assert int(out.iloc[i]["n_frames"]) == pos
        assert int(out.iloc[i]["n_cuts"]) == len(cuts)
        assert out.iloc[i]["cut_idxs"] == ",".join(map(str, cuts))


def test_scene_cuts_single_segment_has_none(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from information_extraction_system_ray.sources.mediacodec import encode_ppm_stream
    from information_extraction_system_ray.stages.multimodal import (
        MEDIA_SCHEMA, scene_cuts)

    rng = np.random.default_rng(7)
    frames = [(np.full((8, 8, 3), 60, np.uint8)
               + rng.integers(0, 3, size=(8, 8, 3), dtype=np.uint8))
              for _ in range(5)]
    t = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "kind": pa.array(["video"], pa.string()),
        "payload": pa.array([encode_ppm_stream(frames)], pa.binary()),
        "mime": pa.array(["video/x-ppm-stream"], pa.string()),
        "width": pa.array([8], pa.int32()),
        "height": pa.array([8], pa.int32()),
        "duration_ms": pa.array([200], pa.int32()),
    }).cast(MEDIA_SCHEMA)
    out = scene_cuts(ray.data.from_arrow(t)).to_pandas()
    assert out.iloc[0]["n_frames"] == 5
    assert out.iloc[0]["n_cuts"] == 0
    assert out.iloc[0]["cut_idxs"] == ""


def test_phash_pairs_match_bruteforce(ray_session):
    """media_phash_pairs recall/precision golden: the banded pair set
    equals the brute-force all-pairs Hamming<=3 set over the same
    hashes (Manku block scheme has EXACT recall at d < num_tables), and
    most planted near-dup pairs are found."""
    import numpy as np

    import __ray_entry__ as e
    from information_extraction_system_ray.queries import media_phash_pairs
    from information_extraction_system_ray.sources.mediacodec import (
        decode_image)
    from information_extraction_system_ray.stages.multimodal import phash64

    sf = "/root/testdata/sf0.001"
    got = media_phash_pairs(sf).to_pandas()
    got_pairs = {(int(r["media_a"]), int(r["media_b"])): int(r["hamming"])
                 for _, r in got.iterrows()}

    # recompute the same corpus + hashes single-process
    n = max(24, 600 // 8) // 2 * 2   # _n_media(sf0.001)=600
    from information_extraction_system_ray.queries import _n_media
    n = max(24, _n_media(sf) // 8) // 2 * 2
    from information_extraction_system_ray.sources.mediacodec import (
        encode_bmp, encode_png, encode_ppm)
    encs = [encode_ppm, encode_bmp, lambda a: encode_png(a)]
    hashes = []
    base = None
    for i in range(n):
        rng = np.random.default_rng(4000 + i)
        if i % 2 == 0:
            base = np.zeros((24, 24, 3), np.uint8)
            for _ in range(3):
                y, x = rng.integers(0, 16, 2)
                hh, ww = rng.integers(4, 9, 2)
                base[y:y + hh, x:x + ww] = rng.integers(40, 256, 3)
            img = base
        else:
            img = np.clip(base.astype(np.int64)
                          + rng.integers(-3, 4, base.shape),
                          0, 255).astype(np.uint8)
        hashes.append(phash64(decode_image(encs[i % 3](img))))
    want = {}
    for a in range(n):
        for b in range(a + 1, n):
            d = bin(hashes[a] ^ hashes[b]).count("1")
            if d <= 3:
                want[(a, b)] = d
    assert got_pairs == want
    planted = [(i, i + 1) for i in range(0, n, 2)]
    found = sum(p in got_pairs for p in planted)
    assert found >= int(0.8 * len(planted))


def test_vad_segments_planted(ray_session):
    """VadSegments recovers the planted tone bursts exactly: each clip
    has 1 + (mid % 3) 300 ms tones separated by 200 ms true silences,
    so detected segment count == planted and every boundary lands
    within one hop+frame of the planted edge."""
    from information_extraction_system_ray.queries import media_vad_segments

    out = (media_vad_segments("/root/testdata/sf0.001").to_pandas()
           .sort_values("media_id").reset_index(drop=True))
    assert len(out) >= 16
    hop, frame = 10, 25
    for _, r in out.iterrows():
        mid = int(r["media_id"])
        k = 1 + mid % 3
        assert int(r["n_segments"]) == k, (mid, r.to_dict())
        # planted layout: 200ms silence, then k x (300ms tone + 200ms
        # silence) — first tone starts at 200ms, last ends at
        # 200 + k*300 + (k-1)*200
        first_planted = 200
        last_planted = 200 + k * 300 + (k - 1) * 200
        assert abs(int(r["first_start_ms"]) - first_planted) <= hop + frame
        assert abs(int(r["last_end_ms"]) - last_planted) <= hop + frame
        # voiced time within one frame+hop per boundary of k*300
        assert abs(int(r["voiced_ms"]) - k * 300) <= k * 2 * (hop + frame)


def test_vad_all_silence_emits_nothing(ray_session):
    import ray

    from information_extraction_system_ray.sources.mediacodec import encode_wav
    from information_extraction_system_ray.stages.multimodal import (
        MEDIA_SCHEMA, vad_segments)

    x = np.zeros(8000, np.float32)
    t = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "kind": pa.array(["audio"], pa.string()),
        "payload": pa.array([encode_wav(x, 8000)], pa.binary()),
        "mime": pa.array(["audio/wav"], pa.string()),
        "width": pa.array([0], pa.int32()),
        "height": pa.array([0], pa.int32()),
        "duration_ms": pa.array([1000], pa.int32()),
    }).cast(MEDIA_SCHEMA)
    assert vad_segments(ray.data.from_arrow(t)).count() == 0


def test_video_neardup_planted_pairs(ray_session):
    """media_video_neardup finds EXACTLY the planted near-copy pairs
    (mid % 4 == 3 duplicates mid−1's content under ±1 jitter) and
    nothing else — the banded-Hamming recall guarantee carried from
    stills up to demuxed video signatures."""
    from information_extraction_system_ray.queries import (_n_media,
                                              media_video_neardup)

    sf = "/root/testdata/sf0.001"
    n = max(16, _n_media(sf) // 4)
    got = {(int(r["id_a"]), int(r["id_b"]))
           for r in media_video_neardup(sf).take_all()}
    want = {(m - 1, m) for m in range(n) if m % 4 == 3}
    assert got == want
