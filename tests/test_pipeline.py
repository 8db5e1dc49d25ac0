"""Pipeline-level tests: byte-identical text invariant, cross-parallelism
determinism, resumable lineage, multimodal plumbing, cell join dedup."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest


def test_extract_text_byte_identical_invariant(ray_session, sf_dir):
    """north_rule: extracted text per url must be byte-identical to the
    generation oracle at any parallelism."""
    from nettopologysuite_ray.functions.text import extract_text_batch
    from nettopologysuite_ray.sources.pages import read_pages

    pages = read_pages(sf_dir)
    out = pages.map_batches(
        lambda b: extract_text_batch(b, out_col="text2"), batch_format="pyarrow", batch_size=64
    )
    for batch in out.iter_batches(batch_format="pyarrow", batch_size=256):
        stored = batch["text"].to_pylist()
        extracted = batch["text2"].to_pylist()
        assert stored == extracted  # byte-identical


def test_northstar_deterministic_across_batch_sizes(ray_session, sf_dir):
    from nettopologysuite_ray.pipelines.northstar import northstar

    _tiled, stats = northstar(sf_dir)
    df1 = stats.to_pandas().sort_values("cell_id").reset_index(drop=True)
    _tiled2, stats2 = northstar(sf_dir, concurrency=(1, 2))
    df2 = stats2.to_pandas().sort_values("cell_id").reset_index(drop=True)
    assert df1.equals(df2)
    assert df1["n"].sum() > 0


def test_resumable_partitioned_run(ray_session, sf_dir, tmp_path):
    import ray.data as rd

    from nettopologysuite_ray.pipelines.resumable import run_partitioned

    out = str(tmp_path / "resume_out")
    calls = []

    def make_ds(pid):
        calls.append(pid)
        return rd.range(10 * (pid + 1))

    params = {"op": "test", "v": 1}
    ran, skipped = run_partitioned(out, [0, 1, 2], make_ds, params)
    assert ran == [0, 1, 2] and skipped == []
    # second run: everything skips, no recompute
    calls.clear()
    ran2, skipped2 = run_partitioned(out, [0, 1, 2], make_ds, params)
    assert ran2 == [] and skipped2 == [0, 1, 2] and calls == []
    # changed params → full recompute (params_hash mismatch)
    ran3, _s = run_partitioned(out, [0], make_ds, {"op": "test", "v": 2})
    assert ran3 == [0]
    # output layout: one directory per partition + lineage markers
    assert os.path.isdir(os.path.join(out, "part=1"))
    assert os.path.exists(os.path.join(out, "_lineage", "part-1.json"))


def test_multimodal_image_stage_plumbing(ray_session):
    import ray.data as rd

    from nettopologysuite_ray.stages.multimodal import (
        ImageDecodeStage,
        synthesize_image_table,
    )

    tbl = synthesize_image_table(48)
    ds = rd.from_arrow(tbl)
    out = ds.map_batches(
        ImageDecodeStage,
        batch_format="pyarrow",
        batch_size=8,  # small batches for wide binary payloads
        concurrency=(1, 2),
        num_cpus=1,
    )
    rows = out.take_all()
    assert len(rows) == 48
    assert all(len(r["image_embedding"]) == 16 for r in rows)
    # payload column dropped after decode (wide bytes never travel further)
    assert "image" not in rows[0]
    # deterministic: same bytes → same embedding
    again = ds.map_batches(
        ImageDecodeStage, batch_format="pyarrow", batch_size=16, concurrency=(1, 2), num_cpus=1
    ).take_all()
    e1 = {r["doc_id"]: tuple(r["image_embedding"]) for r in rows}
    e2 = {r["doc_id"]: tuple(r["image_embedding"]) for r in again}
    assert e1 == e2


def test_multimodal_compressed_decoder_is_explicit_stub():
    """The remaining compressed formats stay honestly stubbed: without
    the fake fallback an animated-webp payload raises
    NotImplementedError.  (jpeg/png are REAL decoders since r5 —
    functions/imagecodec.py, covered by tests/test_imagecodec.py.)"""
    import pyarrow as pa

    from nettopologysuite_ray.stages.multimodal import ImageDecodeStage

    stage = ImageDecodeStage(fake_fallback=False)
    batch = pa.table(
        {
            "doc_id": pa.array([0], type=pa.int64()),
            "image": pa.array([b"RIFF....WEBP fake"], type=pa.binary()),
            "mime": pa.array(["image/webp"]),
        }
    )
    with pytest.raises(NotImplementedError):
        stage(batch)


def test_multimodal_real_ppm_bmp_decode():
    """PPM/BMP decode is REAL: encoders and decoders round-trip pixels
    exactly, resize and grid features run on actual luminance data, and
    the same image encoded as PPM and as BMP produces the same feature
    vector through the actor stage."""
    import numpy as np

    from nettopologysuite_ray.stages.multimodal import (
        ImageDecodeStage,
        decode_bmp,
        decode_ppm,
        encode_bmp,
        encode_ppm,
        grayscale_grid_features,
        resize_nearest,
        synthesize_image_table,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    assert (decode_bmp(encode_bmp(img)) == img).all()
    # odd-width BMP exercises the 4-byte row padding
    img2 = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(img2)) == img2).all()
    small = resize_nearest(img, 4, 4)
    assert small.shape == (4, 4, 3)
    f_ppm = grayscale_grid_features(decode_ppm(encode_ppm(img)))
    f_bmp = grayscale_grid_features(decode_bmp(encode_bmp(img)))
    assert np.allclose(f_ppm, f_bmp)
    # through the stage, on a mixed PPM/BMP table
    stage = ImageDecodeStage(fake_fallback=False)
    out = stage(synthesize_image_table(8, real_formats=True))
    assert out.num_rows == 8 and "image_embedding" in out.column_names


def test_multimodal_wav_decode():
    """WAV decode is real (stdlib wave): a sine burst's energy envelope
    is flat at the sine RMS, and duration matches the synthesis."""
    import numpy as np

    from nettopologysuite_ray.stages.multimodal import (
        AudioDecodeStage,
        decode_wav,
        encode_wav,
        synthesize_audio_table,
    )

    rate = 8000
    t = np.arange(rate) / rate  # exactly 1 s
    wav = encode_wav(0.5 * np.sin(2 * np.pi * 440 * t), rate)
    x, r = decode_wav(wav)
    assert r == rate and x.shape == (rate, 1)
    assert abs(np.sqrt((x**2).mean()) - 0.5 / np.sqrt(2)) < 1e-3
    stage = AudioDecodeStage(n_bins=8, fake_fallback=False)
    out = stage(synthesize_audio_table(6))
    assert out.num_rows == 6
    env = out["energy_envelope"].to_pylist()
    dur = out["duration_s"].to_pylist()
    assert all(len(e) == 8 for e in env)
    assert all(d > 0 for d in dur)
    # sine RMS in every bin
    assert all(abs(v - 0.5 / np.sqrt(2)) < 0.05 for v in env[0])


def test_cell_join_matches_bruteforce(ray_session):
    import ray.data as rd

    from nettopologysuite_ray.stages.cell_join import within_distance_join

    rng = np.random.default_rng(3)
    n_l, n_r = 300, 400
    lx = rng.integers(-17000, 17000, n_l)
    ly = rng.integers(-8500, 8500, n_l)
    rx = rng.integers(-17000, 17000, n_r)
    ry = rng.integers(-8500, 8500, n_r)
    left = rd.from_arrow(pa.table({"event_id": pa.array(range(n_l), pa.int64()),
                                   "lon_1e2": pa.array(lx), "lat_1e2": pa.array(ly)}))
    right = rd.from_arrow(pa.table({"doc_id": pa.array(range(n_r), pa.int64()),
                                    "entity_idx": pa.array([0] * n_r, pa.int64()),
                                    "lon_1e2": pa.array(rx), "lat_1e2": pa.array(ry)}))
    r = 700
    out = within_distance_join(left, right, radius_1e2=r, level=5,
                               left_keys=("event_id",), right_keys=("doc_id", "entity_idx"))
    got = {(row["event_id"], row["doc_id"]) for row in out.take_all()}
    dx = lx[:, None] - rx[None, :]
    dy = ly[:, None] - ry[None, :]
    exp = set(zip(*np.nonzero(dx * dx + dy * dy <= r * r)))
    assert got == exp


def test_salting_splits_hot_cells(ray_session, sf_dir):
    """The skewed fixture puts ~30% of entities in one urban cell; the
    salting pre-pass must detect it and split it into subkeys."""
    from nettopologysuite_ray.pipelines.northstar import entity_dataset
    from nettopologysuite_ray.stages.tiling import (
        assign_cells_batch,
        find_hot_cells,
        salt_hot_cells,
    )

    ds = entity_dataset(sf_dir).map_batches(
        lambda b: assign_cells_batch(b, level=6, kind="hilbert"), batch_format="pyarrow"
    )
    hot, stats_ds = find_hot_cells(ds, threshold_frac=0.05)
    assert len(hot) >= 1  # the urban cell
    stats = stats_ds.to_pandas()
    total = stats["n"].sum()
    assert stats[stats["cell_id"].isin(hot)]["n"].sum() >= 0.2 * total
    # the driver-held hot set is bounded by 1/threshold_frac by construction
    assert len(hot) <= 1 / 0.05
    n_salt = 8
    salted = ds.map_batches(
        lambda b: salt_hot_cells(b, hot, n_salt), batch_format="pyarrow"
    )
    sdf = salted.to_pandas()
    hot_cell = next(iter(hot))
    sub = sdf[sdf["cell_id"] == hot_cell]["salted_cell"].nunique()
    assert sub > 1  # the hot cell actually split
    # non-hot cells keep exactly one subkey
    cold = sdf[~sdf["cell_id"].isin(hot)]
    assert (cold.groupby("cell_id")["salted_cell"].nunique() == 1).all()


def test_within_distance_join_salted_identical(ray_session):
    """Hot-cell salting produces exactly the same pair set (skew split,
    SURVEY.md §4.2): left rows spread over subkeys, right rows
    replicated; the report-at-left-cell rule survives because each left
    row lives in exactly one salted cell."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd
    from nettopologysuite_ray.stages.cell_join import within_distance_join

    rng = np.random.default_rng(3)
    # clustered left points (one hot cell) + scattered right points
    lx = np.concatenate([rng.integers(1300, 1360, 3000), rng.integers(-17000, 17000, 500)])
    ly = np.concatenate([rng.integers(5200, 5260, 3000), rng.integers(-8500, 8500, 500)])
    left = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(lx), dtype=np.int64)),
        "entity_idx": pa.array(np.zeros(len(lx), dtype=np.int64)),
        "lon_1e2": pa.array(lx.astype(np.int64)),
        "lat_1e2": pa.array(ly.astype(np.int64)),
    }))
    rxx = rng.integers(1200, 1500, 400)
    ryy = rng.integers(5100, 5400, 400)
    right = rd.from_arrow(pa.table({
        "event_id": pa.array(np.arange(400, dtype=np.int64)),
        "lon_1e2": pa.array(rxx.astype(np.int64)),
        "lat_1e2": pa.array(ryy.astype(np.int64)),
    }))

    def pairs(**kw):
        df = within_distance_join(left, right, radius_1e2=100, **kw).to_pandas()
        return set(zip(df.doc_id, df.entity_idx, df.event_id, df.dist2))

    base = pairs()
    salted = pairs(salt_threshold=500, n_salt=8)
    assert base == salted and len(base) > 0


def test_sessionize_matches_reference(ray_session):
    """Vectorized hash-bucketed sessionization == a per-user pure-Python
    sessionizer, including ts-tie ordering by event_id and gap edges."""
    import pandas as pd
    import ray.data as rd

    from nettopologysuite_ray.stages.windows import sessionize_stats

    rng = np.random.default_rng(11)
    n = 5000
    uid = rng.integers(0, 40, n).astype(np.int64)
    # coarse timestamps force exact-gap edges and ts ties within a user
    tus = rng.integers(0, 200, n).astype(np.int64) * 1_000_000 * 900
    val = rng.integers(-5000, 5000, n) / 100.0
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(tus.view("datetime64[us]")),
            "user_id": pa.array(uid),
            "value": pa.array(val),
        }
    )
    out = (
        sessionize_stats(rd.from_arrow(tbl), gap_s=1800, num_partitions=7)
        .to_pandas()
        .sort_values(["user_id", "sess_idx"])
        .reset_index(drop=True)
    )

    # reference: per-user python loop
    df = pd.DataFrame({"event_id": np.arange(n), "uid": uid, "tus": tus, "val": val})
    rows = []
    for u, g in df.sort_values(["uid", "tus", "event_id"]).groupby("uid"):
        sess, prev = -1, None
        cur = []
        for _, r in g.iterrows():
            if prev is None or r.tus - prev > 1800 * 1_000_000:
                if cur:
                    rows.append((u, sess, cur))
                sess += 1
                cur = []
            cur.append(r)
            prev = r.tus
        rows.append((u, sess, cur))
    exp = pd.DataFrame(
        [
            {
                "user_id": u,
                "sess_idx": s,
                "n_events": len(c),
                "ts_start_us": int(min(r.tus for r in c)),
                "ts_end_us": int(max(r.tus for r in c)),
                "value_cents": int(
                    sum(int(np.sign(r.val)) * int(np.floor(abs(r.val) * 100 + 0.5)) for r in c)
                ),
            }
            for u, s, c in rows
        ]
    ).sort_values(["user_id", "sess_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_tumbling_window_invariant_to_parallelism(ray_session, sf_dir):
    import ray.data as rd

    from nettopologysuite_ray.stages.windows import tumbling_window_agg

    path = f"{sf_dir}/events.parquet"
    outs = []
    for blocks, parts in ((1, 2), (16, 8)):
        ds = rd.read_parquet(
            path, columns=["ts", "event_type", "value"], override_num_blocks=blocks
        )
        df = (
            tumbling_window_agg(ds, width_s=3600, shuffle_partitions=parts)
            .to_pandas()
            .sort_values(["window_start", "event_type"])
            .reset_index(drop=True)
        )
        outs.append(df)
    assert outs[0].equals(outs[1]) and len(outs[0]) > 10
    assert int(outs[0]["n_events"].sum()) == rd.read_parquet(path).count()


def test_asof_join_matches_bruteforce(ray_session):
    """Hash-bucketed merge_asof == an O(L*R) per-row scan, including
    right-timestamp ties (max id wins) and exact-equality matches."""
    import ray.data as rd

    from nettopologysuite_ray.stages.windows import as_of_join

    rng = np.random.default_rng(23)
    nl, nr = 800, 600
    # coarse grid forces many exact ts collisions on both sides
    def mk(n, base):
        return {
            "event_id": np.arange(base, base + n, dtype=np.int64),
            "uid": rng.integers(0, 25, n).astype(np.int64),
            "tus": rng.integers(0, 50, n).astype(np.int64) * 1_000_000,
        }

    L, R = mk(nl, 0), mk(nr, 10_000)

    def ds_of(d):
        return rd.from_arrow(pa.table({
            "event_id": pa.array(d["event_id"]),
            "ts": pa.array(d["tus"].view("datetime64[us]")),
            "user_id": pa.array(d["uid"]),
        }))

    out = as_of_join(ds_of(L), ds_of(R), num_partitions=5).to_pandas()
    got = set(zip(out.id_l, out.id_r, out.lag_us))

    exp = set()
    for i in range(nl):
        mask = (R["uid"] == L["uid"][i]) & (R["tus"] <= L["tus"][i])
        if mask.any():
            best_t = R["tus"][mask].max()
            best_id = R["event_id"][mask & (R["tus"] == best_t)].max()
            exp.add((L["event_id"][i], best_id, int(L["tus"][i] - best_t)))
    assert got == exp and len(exp) > 400


def test_hopping_window_covers_each_event_k_times(ray_session, sf_dir):
    """Every event lands in exactly width/slide hopping windows, and the
    hopping rollup at slide == width degenerates to the tumbling rollup."""
    import ray.data as rd

    from nettopologysuite_ray.stages.windows import (
        hopping_window_agg,
        tumbling_window_agg,
    )

    path = f"{sf_dir}/events.parquet"
    n = rd.read_parquet(path).count()
    hop = hopping_window_agg(
        rd.read_parquet(path, columns=["ts", "event_type", "value"]),
        width_s=3600, slide_s=900,
    ).to_pandas()
    assert int(hop["n_events"].sum()) == 4 * n

    a = hopping_window_agg(
        rd.read_parquet(path, columns=["ts", "event_type", "value"]),
        width_s=3600, slide_s=3600,
    ).to_pandas().sort_values(["window_start", "event_type"]).reset_index(drop=True)
    b = tumbling_window_agg(
        rd.read_parquet(path, columns=["ts", "event_type", "value"]),
        width_s=3600,
    ).to_pandas().sort_values(["window_start", "event_type"]).reset_index(drop=True)
    assert a.equals(b)


def test_shard_map_parquet_handles_empty_file(ray_session, tmp_path):
    """A zero-row parquet file in the directory must not crash the shard
    reader — its shard yields an empty fn-output block."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from nettopologysuite_ray.sources.shards import shard_map_parquet

    d = tmp_path / "pages"
    d.mkdir()
    full = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                     "x": pa.array([10, 20], type=pa.int64())})
    pq.write_table(full, str(d / "a.parquet"))
    pq.write_table(full.slice(0, 0), str(d / "b.parquet"))

    def double(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return b.set_column(1, "x", pc.multiply(b["x"], 2))

    out = shard_map_parquet(str(d), double).to_pandas().sort_values("doc_id")
    assert out["x"].tolist() == [20, 40]


def test_pii_redactor_ascii_semantics_match_re2():
    """re.ASCII makes \\b/\\d behave like DuckDB's RE2: unicode letters
    are NOT word chars (IP after 'café' IS redacted), unicode digits are
    NOT digits."""
    import pyarrow as pa

    from nettopologysuite_ray.functions.text import PIIRedactor

    out = PIIRedactor()(pa.table({"text": ["café1.2.3.4 and ١٢.٣٤.٥٦.٧٨ end"]}))
    assert out["text"].to_pylist() == ["café<IP> and ١٢.٣٤.٥٦.٧٨ end"]
    assert out["n_ips"].to_pylist() == [1]


def test_tokens_ascii_whitespace_only():
    """The tokenizer splits on ASCII whitespace only (matching the SQL
    oracle's explicit class): nbsp stays inside a token."""
    from nettopologysuite_ray.functions.text import _tokens

    assert _tokens("A B c\td") == ["a b", "c", "d"]
    assert _tokens(" x\x0by ") == ["x", "y"]


def test_token_table_matches_scalar_tokens(sf_dir):
    """The vectorized Arrow tokenizer (_token_table) produces exactly the
    scalar _tokens stream, row by row, over the real documents corpus —
    the parity contract the tf-idf/top-tokens hot paths rely on."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nettopologysuite_ray.functions.text import _token_table, _tokens

    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])["text"]
    col = texts.combine_chunks()
    parent, toks = _token_table(col)
    parent = parent.to_pylist()
    toks = toks.to_pylist()
    got: dict[int, list] = {}
    for i, t in zip(parent, toks):
        got.setdefault(i, []).append(t)
    for i, t in enumerate(texts.to_pylist()):
        assert got.get(i, []) == _tokens(t), f"row {i} diverges"


def test_broadcast_join_arrow_fast_path_matches_pandas_merge():
    """The Arrow index_in/take hot path of BroadcastJoin produces exactly
    the pandas-merge result (inner + left, unique keys), and duplicate or
    multi-key dimensions transparently fall back to the generic merge."""
    import pandas as pd
    import pyarrow as pa

    from nettopologysuite_ray.stages.relational import BroadcastJoin

    batch = pa.table(
        {
            "k": pa.array([3, 1, 2, 9, 1], type=pa.int64()),
            "x": pa.array([30, 10, 20, 90, 11], type=pa.int64()),
        }
    )
    dim = pd.DataFrame({"k": [1, 2, 3], "name": ["one", "two", "three"]})

    inner = BroadcastJoin(dim, "k", "inner")
    assert inner.build_keys is not None  # fast path engaged
    got = inner(batch).to_pandas()
    exp = batch.to_pandas().merge(dim, on="k", how="inner")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )

    left = BroadcastJoin(dim, "k", "left")
    got = left(batch).to_pandas()
    exp = batch.to_pandas().merge(dim, on="k", how="left")
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # duplicate build keys -> row-multiplying join must use the fallback
    dup = pd.DataFrame({"k": [1, 1, 2], "name": ["a", "b", "c"]})
    bj = BroadcastJoin(dup, "k", "inner")
    assert bj.build_keys is None
    got = bj(batch).to_pandas()
    exp = batch.to_pandas().merge(dup, on="k", how="inner")
    assert sorted(map(tuple, got.to_numpy().tolist())) == sorted(
        map(tuple, exp.to_numpy().tolist())
    )
