import numpy as np
import pyarrow as pa

from well_duplicates_ray.config import DedupConfig
from well_duplicates_ray.fixtures import IMG_H, IMG_W, make_images
from well_duplicates_ray.functions.phash import hamming64, phash_raw_batch
from well_duplicates_ray.functions.text import exact_jaccard, shingle_hashes

CFG = DedupConfig()


def test_fixture_schema_and_determinism():
    t1, p1 = make_images(120, seed=42)
    t2, p2 = make_images(120, seed=42)
    assert t1.equals(t2) and p1.equals(p2)
    assert t1.column_names == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    assert t1.num_rows == 120
    assert t1["fmt"].to_pylist() == ["raw"] * 120
    t3, _ = make_images(120, seed=43)
    assert not t1.equals(t3)


def test_fixture_phash_column_matches_payload():
    t, _ = make_images(80, seed=1)
    recomputed = phash_raw_batch(
        t["bytes"].to_pylist(), t["w"].to_pylist(), t["h"].to_pylist()
    ).view(np.int64)
    assert np.array_equal(recomputed, t["phash"].to_numpy())
    assert all(len(b) == IMG_W * IMG_H * 3 for b in t["bytes"].to_pylist())


def test_injection_classes_hold():
    t, truth = make_images(400, seed=42)
    ids = {x: i for i, x in enumerate(t["image_id"].to_pylist())}
    captions = t["caption"].to_pylist()
    payloads = t["bytes"].to_pylist()
    ph = np.asarray(t["phash"].to_numpy()).view(np.uint64)
    assert truth.num_rows > 10
    for a, b, cls in zip(*[truth[c].to_pylist() for c in ("a", "b", "cls")]):
        i, j = ids[a], ids[b]
        if cls == "exact":
            assert payloads[i] == payloads[j] and captions[i] == captions[j]
        elif cls == "near_pixel":
            assert hamming64(ph[i : i + 1], ph[j : j + 1])[0] <= CFG.phash_radius
        elif cls == "caption_para":
            va, oa = shingle_hashes([captions[i]], CFG.shingle_k)
            vb, ob = shingle_hashes([captions[j]], CFG.shingle_k)
            assert exact_jaccard(va, vb) >= CFG.jaccard_threshold
        elif cls == "substring":
            from well_duplicates_ray.functions.suffix import has_common_run

            assert has_common_run(captions[i], captions[j], CFG.substring_min_len)
        elif cls == "hot_bucket":
            assert captions[i] == captions[j]
