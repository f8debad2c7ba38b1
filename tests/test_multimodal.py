"""Multimodal stages (stages/multimodal.py): hermetic REAL-mode codecs
(BMP / PPM / WAV PCM / concatenated-P6 video) must roundtrip exactly,
the actor-pool stages must run fake=False end-to-end on generated
fixtures, and the real-mode features are pinned by goldens (any codec
or pooling change that alters decoded bytes breaks these)."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import ray.data as rd

from opps_feedcrawler_ray.stages.multimodal import (
    AudioFrameStage,
    ImageDecodeStage,
    VideoFrameSampleStage,
    decode_bmp,
    decode_images,
    decode_ppm,
    decode_ppm_stream,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_ppm_stream,
    encode_wav,
    frame_audio,
    sample_video_frames,
    synth_media_table,
)


def test_bmp_roundtrip_exact():
    rng = np.random.default_rng(3)
    for h, w in ((1, 1), (5, 3), (16, 16), (7, 13)):  # odd widths hit row padding
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img), (h, w)
    # top-down BMP (negative height) decodes too
    img = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    buf = bytearray(encode_bmp(img[::-1]))
    buf[22:26] = (-4).to_bytes(4, "little", signed=True)
    assert np.array_equal(decode_bmp(bytes(buf)), img[::-1][::-1])


def test_ppm_roundtrip_and_comments():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # comment-bearing header (ImageMagick emits these)
    commented = b"P6\n# made by a test\n9 6\n# another\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(commented), img)


def test_wav_roundtrip_to_quantization():
    t = np.arange(2000, dtype=np.float64)
    x = 0.5 * np.sin(2 * np.pi * t / 50.0)
    got, rate = decode_wav(encode_wav(x, sample_rate=16000))
    assert rate == 16000
    assert len(got) == len(x)
    assert np.abs(got - x).max() <= 1.0 / 32768.0 + 1e-7  # 16-bit quantization


def test_ppm_stream_roundtrip():
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (4 + i, 5, 3), dtype=np.uint8) for i in range(5)]
    got = decode_ppm_stream(encode_ppm_stream(frames))
    assert len(got) == 5
    for a, b in zip(got, frames):
        assert np.array_equal(a, b)


def test_real_mode_stages_end_to_end(ray_session):
    """fake=False over generated real payloads: every image decodes to
    its true dimensions, every audio row frames its true sample count,
    every video samples the expected frame indices."""
    media = synth_media_table(32, real=True)
    metas = {i: json.loads(m) for i, m in zip(
        media["media_id"].to_pylist(), media["meta"].to_pylist())}
    ds = rd.from_arrow(media)

    imgs = decode_images(
        ds.filter(lambda r: r["kind"] == "image"), concurrency=2, batch_size=4, fake=False
    ).to_pandas()
    assert len(imgs) == 16
    for _, row in imgs.iterrows():
        m = metas[row["media_id"]]
        assert (row["height"], row["width"]) == (m["height"], m["width"])
        assert len(row["feature"]) == 8 * 8 * 3

    auds = frame_audio(
        ds.filter(lambda r: r["kind"] == "audio"), concurrency=2, batch_size=4, fake=False
    ).to_pandas()
    assert len(auds) == 8
    assert (auds["sample_rate"] == 8000).all()
    for _, row in auds.iterrows():
        n_samples = 1000 + (row["media_id"] * 97) % 1000
        assert row["n_frames"] == n_samples // 256

    vids = sample_video_frames(
        ds.filter(lambda r: r["kind"] == "video"), concurrency=2, batch_size=4,
        fake=False, stride=2,
    ).to_pandas()
    assert len(vids) == sum(
        -(-(4 + int(i) % 6) // 2) for i in metas if metas[i].get("n_frames")
    )
    for mid, grp in vids.groupby("media_id"):
        assert sorted(grp["frame_idx"]) == list(range(0, metas[mid]["n_frames"], 2))


def test_real_mode_feature_goldens():
    """Pinned real-mode decode values — freezes the codec + pooling spec.
    Computed once from the frozen deterministic fixtures; a change here
    is a breaking spec change."""
    media = synth_media_table(8, real=True)
    img_stage = ImageDecodeStage(fake=False)
    out = img_stage(media.filter(pa.compute.equal(media["kind"], "image")))
    means = {
        int(i): int(round(float(np.mean(f)) * 1e6))
        for i, f in zip(out["media_id"].to_pylist(), out["feature"].to_pylist())
    }
    aud_stage = AudioFrameStage(fake=False)
    aout = aud_stage(media.filter(pa.compute.equal(media["kind"], "audio")))
    a_first = {
        int(i): int(round(float(e[0]) * 1e6))
        for i, e in zip(aout["media_id"].to_pylist(), aout["frame_energy"].to_pylist())
    }
    vid_stage = VideoFrameSampleStage(fake=False, stride=2)
    vout = vid_stage(media.filter(pa.compute.equal(media["kind"], "video")))
    v_first = {
        (int(i), int(fi)): int(round(float(np.mean(f)) * 1e6))
        for i, fi, f in zip(
            vout["media_id"].to_pylist(), vout["frame_idx"].to_pylist(),
            vout["feature"].to_pylist())
    }
    golden = {
        "img_mean_e6": means,
        "audio_first_energy_e6": a_first,
        "video_first_mean_e6": {f"{k[0]}:{k[1]}": v for k, v in v_first.items()},
    }
    import pathlib

    gpath = pathlib.Path(__file__).parent / "golden" / "multimodal_real.json"
    want = json.loads(gpath.read_text())
    assert golden == {
        "img_mean_e6": {int(k): v for k, v in want["img_mean_e6"].items()},
        "audio_first_energy_e6": {int(k): v for k, v in want["audio_first_energy_e6"].items()},
        "video_first_mean_e6": want["video_first_mean_e6"],
    }


def test_fake_mode_plumbing_unchanged(ray_session):
    """The fake pseudo-decode path (plumbing tests / codec-free smoke)
    still runs with the original schema semantics."""
    media = rd.from_arrow(synth_media_table(16, real=False))
    imgs = decode_images(
        media.filter(lambda r: r["kind"] == "image"), concurrency=2, batch_size=4, fake=True
    ).to_pandas()
    assert len(imgs) == 8 and (imgs["height"] >= 8).all()
    auds = frame_audio(
        media.filter(lambda r: r["kind"] == "audio"), concurrency=2, batch_size=4, fake=True
    ).to_pandas()
    assert len(auds) == 8 and (auds["sample_rate"] == 0).all()


def test_image_phash_dups_finds_planted_near_dups(ray_session):
    import ray.data as rd

    from opps_feedcrawler_ray.stages.multimodal import (
        ImagePHashStage, average_hash64, decode_bmp, decode_ppm,
        image_phash_dups, synth_image_dup_table,
    )

    t = synth_image_dup_table(96)
    ds = rd.from_arrow(t)
    got = image_phash_dups(ds, max_hamming=4)

    # brute-force twin over the same hashes
    hashes = {}
    for mid, payload in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
        img = decode_bmp(payload) if payload[:2] == b"BM" else decode_ppm(payload)
        hashes[mid] = average_hash64(img)
    brute = {}
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin(hashes[a] ^ hashes[b]).count("1")
            if ham <= 4:
                brute[(a, b)] = ham
    reported = {(a, b): h for a, b, h in got.itertuples(index=False, name=None)}
    # soundness: every reported pair is a true <=4 pair with correct distance
    assert set(reported) <= set(brute)
    for k, v in reported.items():
        assert brute[k] == v
    # recall guarantee: Hamming <= 3 pigeonholes into a clean 16-bit band
    assert {k for k, v in brute.items() if v <= 3} <= set(reported)
    # the planted jittered copies are found (phash equal or near-equal)
    planted = [(i - 1, i) for i in range(2, 96, 3)]
    found_planted = sum(1 for p in planted if p in reported)
    assert found_planted >= len(planted) * 3 // 4, (found_planted, len(planted))
    # determinism
    import pandas as pd

    again = image_phash_dups(ds, max_hamming=4)
    pd.testing.assert_frame_equal(got, again)


def test_audio_fp_dups_finds_planted_near_dups(ray_session):
    import ray.data as rd

    from opps_feedcrawler_ray.stages.multimodal import (
        audio_fingerprint64, audio_fp_dups, decode_wav, synth_audio_dup_table,
    )

    t = synth_audio_dup_table(60)
    ds = rd.from_arrow(t)
    got = audio_fp_dups(ds, max_hamming=4)

    # brute-force twin over the same fingerprints
    fps = {}
    for mid, payload in zip(t["media_id"].to_pylist(), t["payload"].to_pylist()):
        s, _ = decode_wav(payload)
        fps[mid] = audio_fingerprint64(s.astype(np.float64))
    brute = {}
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin(fps[a] ^ fps[b]).count("1")
            if ham <= 4:
                brute[(a, b)] = ham
    reported = {(a, b): h for a, b, h in got.itertuples(index=False, name=None)}
    assert set(reported) <= set(brute)
    for k, v in reported.items():
        assert brute[k] == v
    assert {k for k, v in brute.items() if v <= 3} <= set(reported)
    planted = [(i - 1, i) for i in range(2, 60, 3)]
    found = sum(1 for p in planted if p in reported)
    assert found >= len(planted) * 3 // 4, (found, len(planted))
    # determinism
    import pandas as pd

    pd.testing.assert_frame_equal(got, audio_fp_dups(ds, max_hamming=4))


def test_video_scene_detection_recovers_planted_cuts(ray_session):
    import json

    from opps_feedcrawler_ray.stages.multimodal import (
        detect_video_scenes, synth_video_scene_table,
    )

    tbl = synth_video_scene_table(24)
    got = (
        detect_video_scenes(rd.from_arrow(tbl), concurrency=2, batch_size=4,
                            fake=False)
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    )
    assert len(got) == 24
    metas = [json.loads(m) for m in tbl["meta"].to_pylist()]
    for i, row in got.iterrows():
        true_bounds = metas[i]["true_bounds"]
        assert list(row["boundaries"]) == true_bounds
        assert int(row["n_scenes"]) == 1 + i % 4
        assert int(row["n_frames"]) == metas[i]["n_frames"]


def test_video_scene_stage_matches_replay_twin(ray_session):
    import json

    import numpy as np

    from opps_feedcrawler_ray.stages.multimodal import (
        VideoSceneStage, decode_ppm_stream, synth_video_scene_table,
    )

    tbl = synth_video_scene_table(6)
    out = VideoSceneStage(fake=False, threshold=30.0)(tbl).to_pandas()
    for i in range(6):
        frames = [f.astype(np.float64)
                  for f in decode_ppm_stream(tbl["payload"][i].as_py())]
        cuts = [
            j for j in range(1, len(frames))
            if int(np.floor(float(np.abs(frames[j] - frames[j - 1]).mean())
                            * 1e3 + 0.5)) > 30000
        ]
        assert list(out["boundaries"][i]) == cuts
        assert int(out["n_scenes"][i]) == len(cuts) + 1


def test_media_quality_signals_match_replay(ray_session):
    from opps_feedcrawler_ray.stages.multimodal import (
        decode_bmp, decode_ppm, decode_wav, media_quality, synth_media_table,
    )

    tbl = synth_media_table(32, real=True)
    got = (
        media_quality(rd.from_arrow(tbl), concurrency=2, batch_size=8,
                      fake=False)
        .to_pandas().set_index("media_id")
    )
    n_checked = 0
    for mid, kind, payload in zip(tbl["media_id"].to_pylist(),
                                  tbl["kind"].to_pylist(),
                                  tbl["payload"].to_pylist()):
        if kind == "image":
            img = decode_bmp(payload) if payload[:2] == b"BM" else decode_ppm(payload)
            luma = img.astype(np.float64).mean(axis=2)
            hist = np.bincount(
                np.minimum((luma / 16).astype(np.int64), 15).ravel(),
                minlength=16).astype(np.float64)
            p = hist / hist.sum()
            exp = (luma.mean(), luma.std(),
                   float(-(p[p > 0] * np.log2(p[p > 0])).sum()))
        elif kind == "audio":
            x, rate = decode_wav(payload)
            x = x.astype(np.float64)
            exp = (float(np.sqrt((x * x).mean())),
                   float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()),
                   len(x) / rate)
        else:
            assert mid not in got.index  # video rides the scene detector
            continue
        for col, v in zip(("q1_e6", "q2_e6", "q3_e6"), exp):
            assert int(got.loc[mid, col]) == int(np.floor(v * 1e6 + 0.5))
        n_checked += 1
    assert n_checked > 10
