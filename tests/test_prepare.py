"""Data-prep recipe tests on tiny handcrafted jsonl fixtures."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from gcn_recommendation_tpu.data.prepare import RECIPES, kcore_filter, prepare_and_save_data


def _write_jsonl(path, records):
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def test_kcore_filter_iterative():
    # chain where removing a weak user cascades to a weak item
    users = np.array([0, 0, 1, 1, 2], np.int64)
    items = np.array([0, 1, 0, 1, 2], np.int64)
    keep = kcore_filter(users, items, k=2)
    # user 2 has 1 interaction -> dropped; item 2 then orphaned -> dropped
    np.testing.assert_array_equal(keep, [True, True, True, True, False])


def test_kcore_filter_noop_for_k1():
    users = np.array([0, 1, 2], np.int64)
    items = np.array([0, 1, 2], np.int64)
    assert kcore_filter(users, items, 1).all()


@pytest.fixture()
def books_fixture(tmp_path):
    reviews = []
    # 3 users x 3 items fully connected -> survives 3-core
    for u in range(3):
        for i in range(3):
            reviews.append(
                {"user_id": f"u{u}", "parent_asin": f"i{i}", "rating": float(1 + (u + i) % 5)}
            )
    # weak user filtered by 3-core
    reviews.append({"user_id": "weak", "parent_asin": "i0", "rating": 5.0})
    meta = [
        {"parent_asin": "i0", "author": {"name": "AuthorA"}},
        {"parent_asin": "i1", "author": "plainstring"},
        {"parent_asin": "i2"},
    ]
    rp, mp = tmp_path / "r.jsonl", tmp_path / "m.jsonl"
    _write_jsonl(rp, reviews)
    _write_jsonl(mp, meta)
    return str(rp), str(mp), str(tmp_path / "out")


def test_amazon_books_recipe(books_fixture):
    rp, mp, out_base = books_fixture
    out = prepare_and_save_data(RECIPES["amazon_books"], rp, mp, out_base, core=3)
    assert out.endswith("processed_data_3")
    stats = json.load(open(os.path.join(out, "stats.json")))
    assert stats["num_users"] == 3 and stats["num_items"] == 3
    # authors: AuthorA + Unknown (non-dict author and missing author)
    assert stats["num_brands"] == 2
    train = pd.read_parquet(os.path.join(out, "train.parquet"))
    test = pd.read_parquet(os.path.join(out, "test.parquet"))
    # leave-one-out: exactly one test row per user
    assert len(test) == 3
    assert len(train) + len(test) == 9
    # per-user: the test row is the max-rating interaction
    full = pd.concat([train.assign(s="tr"), test.assign(s="te")])
    assert not os.path.exists(os.path.join(out, "item_embeddings.npy"))


def test_amazon_books_emb_recipe(tmp_path):
    reviews = []
    for u in range(3):
        for i in range(3):
            reviews.append(
                {
                    "user_id": f"u{u}",
                    "item_id": f"i{i}",
                    "rating": 4.0,
                    "sentiment": "positive" if (u + i) % 2 == 0 or True else "negative",
                }
            )
    reviews.append({"user_id": "u0", "item_id": "i0", "rating": 1.0, "sentiment": "negative"})
    meta = [
        {"item_id": "i0", "categories": ["Root", "Fiction", "SciFi"], "embd": [0.1] * 4},
        {"item_id": "i1", "categories": ["Root", "Fiction"], "embd": [0.2] * 4},
        {"item_id": "i2", "categories": [], "embd": None},
    ]
    rp, mp = tmp_path / "r.jsonl", tmp_path / "m.jsonl"
    _write_jsonl(rp, reviews)
    _write_jsonl(mp, meta)
    out = prepare_and_save_data(
        RECIPES["amazon_books_emb"], str(rp), str(mp), str(tmp_path / "o"), core=1
    )
    assert out.endswith("processed_data_1_pos_only_cat")
    ib = pd.read_parquet(os.path.join(out, "item_brand.parquet"))
    # i0 -> Fiction, SciFi (2 rows); i1 -> Fiction; i2 -> Unknown
    assert len(ib) == 4
    emb = np.load(os.path.join(out, "item_embeddings.npy"))
    assert emb.shape == (3, 4)
    # i2 had no embedding -> zero-filled row
    assert (emb[2] == 0).all()


def test_steam_recipe_temporal_split(tmp_path):
    reviews = []
    for u in range(2):
        for t, i in enumerate(["a", "b", "c"]):
            reviews.append(
                {"user_id": f"u{u}", "item_id": i, "timestamp": t, "recommanded": True}
            )
    reviews.append({"user_id": "u0", "item_id": "a", "timestamp": 99, "recommanded": False})
    meta = [
        {"item_id": "a", "genres": ["RPG"], "tags": {"Indie": 10}},
        {"item_id": "b", "genres": [], "tags": {}},
    ]
    rp, mp = tmp_path / "r.jsonl", tmp_path / "m.jsonl"
    _write_jsonl(rp, reviews)
    _write_jsonl(mp, meta)
    out = prepare_and_save_data(
        RECIPES["steam_emb"], str(rp), str(mp), str(tmp_path / "o"), core=1
    )
    test = pd.read_parquet(os.path.join(out, "test.parquet"))
    train = pd.read_parquet(os.path.join(out, "train.parquet"))
    # newest (timestamp=2 -> item 'c') per user goes to test
    item_map_c = 2  # 'c' third distinct item
    assert (test["item_idx"] == item_map_c).all()
    assert len(test) == 2 and len(train) == 4


def test_loader_rejects_missing_stats(tmp_path):
    from gcn_recommendation_tpu.data.loader import load_preprocessed_data

    with pytest.raises(FileNotFoundError):
        load_preprocessed_data(str(tmp_path))


# ---------------------------------------------------------------------------
# Adversarial ETL fuzzing (round-2 VERDICT #7): every recipe must survive
# hostile jsonl — multi-MB lines, unicode garbage, duplicate ids, embd
# length drift, numeric brands — producing the same node counts as a
# clean-only run (garbage skipped, never silently miscounted).
# ---------------------------------------------------------------------------

def _clean_records(recipe_name, n_users=4, n_items=4):
    """(reviews, meta) records every recipe parses as fully clean."""
    reviews, meta = [], []
    for u in range(n_users):
        for i in range(n_items):
            base = {"user_id": f"u{u}", "rating": float(1 + (u + i) % 5),
                    "sentiment": "positive", "recommanded": True,
                    "timestamp": float(u * 10 + i)}
            if recipe_name in ("amazon_books", "amazon_books_senti"):
                base["parent_asin"] = f"i{i}"
            else:
                base["item_id"] = f"i{i}"
            reviews.append(base)
    for i in range(n_items):
        m = {"author": {"name": f"A{i % 2}"},
             "details": {"Brand": f"B{i % 2}"},
             "categories": ["Root", f"Cat{i % 2}", "CatX"],
             "genres": [f"G{i % 2}"], "tags": {"Indie": 3},
             "embd": [float(i)] * 8}
        if recipe_name in ("amazon_books", "amazon_books_senti",
                           "amazon_sport_emb"):
            m["parent_asin"] = f"i{i}"
        else:
            m["item_id"] = f"i{i}"
        meta.append(m)
    return reviews, meta


def _hostile_lines():
    """Raw hostile jsonl lines (strings, appended verbatim)."""
    big = json.dumps({"irrelevant": "A" * 2_500_000})  # multi-MB valid line
    return [
        big,
        '\xff\xfe\x00 binary-ish garbage \x9c',        # undecodable bytes
        '{"user_id": "u‮\ud800"',                  # truncated + weird unicode
        json.dumps({"user_id": "気‮", "rating": None,
                    "sentiment": "positive", "recommanded": True}),  # null fields
        '[1, 2, 3]',                                    # non-object JSON
        'null',
        json.dumps({"user_id": 12345, "item_id": {"nested": True},
                    "parent_asin": ["list"], "rating": "four-ish",
                    "timestamp": "yesterday", "sentiment": "positive",
                    "recommanded": True}),              # garbage field types
    ]


def _hostile_meta_lines():
    return [
        json.dumps({"item_id": "i0", "parent_asin": "i0",
                    "categories": [None, 7, 2.5],       # numeric/None brands
                    "author": 999, "details": "not-a-dict",
                    "genres": "not-a-list", "tags": ["not", "a", "dict"],
                    "embd": 3.14}),                     # scalar embd
        json.dumps({"item_id": "i1", "parent_asin": "i1",
                    "categories": ["Root", "Cat1", "CatX"],
                    "author": {"name": "A1"}, "details": {"Brand": "B1"},
                    "genres": ["G1"], "tags": {"Indie": 3},
                    "embd": [[1.0, 2.0]]}),             # nested embd
        '{"item_id": "i2", "categor',                   # truncated
        json.dumps({"wrong_key_only": True}),
    ]


@pytest.mark.parametrize("recipe_name", sorted(RECIPES))
def test_fuzz_hostile_jsonl_every_recipe(tmp_path, recipe_name):
    reviews, meta = _clean_records(recipe_name)

    def run(tag, extra_review_lines=(), extra_meta_lines=(), dupes=0):
        rp = tmp_path / f"r_{tag}.jsonl"
        mp = tmp_path / f"m_{tag}.jsonl"
        with open(rp, "w", encoding="utf-8", errors="surrogateescape") as f:
            lines = [json.dumps(r) for r in reviews] + list(extra_review_lines)
            # duplicates of clean rows — real dumps repeat interactions
            lines += [json.dumps(reviews[j % len(reviews)]) for j in range(dupes)]
            rng = np.random.default_rng(7)
            for j in rng.permutation(len(lines)):
                try:
                    f.write(lines[j] + "\n")
                except UnicodeEncodeError:
                    f.write(lines[j].encode("utf-8", "replace").decode() + "\n")
        with open(mp, "w", encoding="utf-8") as f:
            for line in list(extra_meta_lines) + [json.dumps(m) for m in meta]:
                f.write(line + "\n")
        return prepare_and_save_data(
            RECIPES[recipe_name], str(rp), str(mp),
            str(tmp_path / f"o_{tag}"), core=2,
        )

    out_clean = run("clean")
    out_fuzz = run("fuzz", _hostile_lines(), _hostile_meta_lines(), dupes=5)
    s_clean = json.load(open(os.path.join(out_clean, "stats.json")))
    s_fuzz = json.load(open(os.path.join(out_fuzz, "stats.json")))
    # node counts identical: hostile lines are skipped, clean-row
    # duplicates add interactions but never new users/items/brands
    assert s_fuzz == s_clean, (recipe_name, s_clean, s_fuzz)
    test = pd.read_parquet(os.path.join(out_fuzz, "test.parquet"))
    assert len(test) == s_fuzz["num_users"]  # leave-one-out invariant holds


def test_fuzz_embd_length_drift(tmp_path):
    """'embd' length drifting mid-file: the matrix dim must follow the
    MODAL length (never the first record's), drifted vectors stay zero."""
    reviews, meta = _clean_records("amazon_books_emb", n_users=4, n_items=6)
    # first item's vector is truncated (drifted); majority are length 8
    meta[0]["embd"] = [0.5, 0.5]
    meta[5]["embd"] = "corrupt"
    rp, mp = tmp_path / "r.jsonl", tmp_path / "m.jsonl"
    _write_jsonl(rp, reviews)
    _write_jsonl(mp, meta)
    out = prepare_and_save_data(
        RECIPES["amazon_books_emb"], str(rp), str(mp), str(tmp_path / "o"), core=2
    )
    emb = np.load(os.path.join(out, "item_embeddings.npy"))
    assert emb.shape[1] == 8          # modal, not first-record, length
    assert (emb[0] == 0).all()        # drifted vector rejected -> zero row
    assert (np.abs(emb).sum(axis=1) > 0).sum() == 4  # i1..i4 kept


def test_fuzz_scalar_first_embd_does_not_crash(tmp_path):
    """A truthy scalar first 'embd' used to crash len() (round-2
    ADVICE.md); now it is skipped and the rest of the file decides."""
    reviews, meta = _clean_records("amazon_books_emb", n_users=4, n_items=4)
    meta[0]["embd"] = 3.14
    rp, mp = tmp_path / "r.jsonl", tmp_path / "m.jsonl"
    _write_jsonl(rp, reviews)
    _write_jsonl(mp, meta)
    out = prepare_and_save_data(
        RECIPES["amazon_books_emb"], str(rp), str(mp), str(tmp_path / "o"), core=2
    )
    emb = np.load(os.path.join(out, "item_embeddings.npy"))
    assert emb.shape[1] == 8
    assert (np.abs(emb).sum(axis=1) > 0).sum() == 3


def test_dirty_real_dump_lines_survive(tmp_path):
    """Real Amazon/Steam dumps contain truncated JSON, non-object rows,
    garbage field types, and broken 'embd' vectors; the pipeline must
    skip-and-count them instead of dying (round-1 VERDICT.md missing #5:
    the reference scripts crash on the first bad line)."""
    rp, mp = tmp_path / "r.jsonl", tmp_path / "m.jsonl"
    with open(rp, "w") as f:
        # clean interactions: 3 users x 3 items (survives 2-core)
        for u in range(3):
            for i in range(3):
                f.write(json.dumps({
                    "user_id": f"u{u}", "item_id": f"i{i}",
                    "sentiment": "positive", "rating": 4.0,
                }) + "\n")
        f.write('{"user_id": "u0", "item_id": "i0", "sentiment": "positive", "rat')  # truncated
        f.write("\n")
        f.write('"just a string"\n')       # non-object JSON
        f.write("42\n")                    # non-object JSON
        f.write("\n")                      # blank
        f.write(json.dumps({               # rating of a garbage type
            "user_id": "u1", "item_id": "i1", "sentiment": "positive",
            "rating": "five-ish",
        }) + "\n")
        f.write(json.dumps({               # missing keys
            "sentiment": "positive", "rating": 3.0,
        }) + "\n")
    with open(mp, "w") as f:
        f.write(json.dumps({
            "item_id": "i0", "categories": ["Root", "CatA", "CatB"],
            "embd": [1.0, 2.0],
        }) + "\n")
        f.write(json.dumps({               # non-string category labels
            "item_id": "i1", "categories": ["Root", None, 7],
            "embd": [3.0],                 # wrong length -> skipped
        }) + "\n")
        f.write(json.dumps({               # categories of a garbage type
            "item_id": "i2", "categories": "not-a-list",
            "embd": ["a", "b"],            # non-numeric -> skipped
        }) + "\n")
        f.write('{"item_id": "i2", "categor\n')  # truncated

    out = prepare_and_save_data(
        RECIPES["amazon_books_emb"], str(rp), str(mp), str(tmp_path / "o"),
        core=2,
    )
    stats = json.load(open(os.path.join(out, "stats.json")))
    assert stats["num_users"] == 3 and stats["num_items"] == 3
    # brand labels coerced to strings ("None", "7")
    ib = pd.read_parquet(os.path.join(out, "item_brand.parquet"))
    assert len(ib) > 0
    emb = np.load(os.path.join(out, "item_embeddings.npy"))
    assert emb.shape == (3, 2)
    # exactly one usable vector (i0); the wrong-length and non-numeric
    # ones stay zero
    nonzero_rows = (np.abs(emb).sum(axis=1) > 0).sum()
    assert nonzero_rows == 1


# ---------------------------------------------------------------------------
# Synthetic regime knobs (latent taste model — multi-regime grids)
# ---------------------------------------------------------------------------


def test_synthetic_latent_informative_embeddings(tmp_path):
    """emb_noise derives item_embeddings.npy from the true item factors:
    low-noise embeddings must correlate with the factors far more than
    high-noise ones (cosine against the best linear reconstruction)."""
    from gcn_recommendation_tpu.data.synthetic import (
        generate_interactions_latent,
        informative_item_embeddings,
    )

    rng = np.random.default_rng(0)
    _, _, lv = generate_interactions_latent(
        rng, 200, 120, 8.0, 3, latent_dim=8, return_latents=True
    )
    assert lv.shape == (120, 8)
    lo = informative_item_embeddings(np.random.default_rng(1), lv, 16, noise=0.1)
    hi = informative_item_embeddings(np.random.default_rng(1), lv, 16, noise=50.0)
    assert lo.shape == hi.shape == (120, 16)
    # least-squares reconstruction residual of lv from the embeddings
    def resid(e):
        sol, *_ = np.linalg.lstsq(e, lv, rcond=None)
        return float(np.linalg.norm(e @ sol - lv) / np.linalg.norm(lv))

    # row normalization forfeits per-row scale, so recovery is not exact
    # even at low noise — the point is the large gap vs the noise regime
    assert resid(lo) < 0.45 < 0.8 < resid(hi)


def test_synthetic_latent_brand_clusters(tmp_path):
    """brand_style='latent' groups items whose factors are close: the
    mean within-brand pairwise distance must undercut the global one."""
    from gcn_recommendation_tpu.data.synthetic import (
        generate_interactions_latent,
        latent_cluster_brands,
    )

    rng = np.random.default_rng(0)
    _, _, lv = generate_interactions_latent(
        rng, 200, 150, 8.0, 3, latent_dim=6, return_latents=True
    )
    brands = latent_cluster_brands(np.random.default_rng(1), lv, 10)
    assert brands.shape == (150,)
    assert brands.min() >= 0 and brands.max() < 10

    def mean_pairwise(x):
        d = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
        return d[np.triu_indices(len(x), 1)].mean()

    within = np.mean([
        mean_pairwise(lv[brands == b])
        for b in range(10)
        if (brands == b).sum() >= 2
    ])
    assert within < 0.8 * mean_pairwise(lv)


def test_synthetic_dataset_regime_knobs_roundtrip(tmp_path):
    """generate_synthetic_dataset accepts the regime knobs and writes the
    standard artifact set with an informative embedding matrix."""
    from gcn_recommendation_tpu.data.synthetic import generate_synthetic_dataset

    out = generate_synthetic_dataset(
        str(tmp_path / "ds"),
        num_users=150,
        num_items=80,
        num_brands=8,
        mean_degree=8.0,
        core=3,
        seed=7,
        embedding_dim=12,
        style="latent",
        latent_dim=6,
        temperature=0.25,
        emb_noise=0.3,
        brand_style="latent",
    )
    for f in ("train.parquet", "test.parquet", "item_brand.parquet",
              "stats.json", "item_embeddings.npy"):
        assert os.path.exists(os.path.join(out, f)), f
    emb = np.load(os.path.join(out, "item_embeddings.npy"))
    assert emb.shape == (80, 12)
    norms = np.linalg.norm(emb, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# Round-5 curve-shape knobs (rank split, factor spectrum, tails, mislead)
# ---------------------------------------------------------------------------


def test_synthetic_rank_split_holds_out_top_preference(tmp_path):
    """split='rank' must hold out each user's HIGHEST realized-preference
    interaction (the reference recipes' rating-rank-1 protocol,
    dataset/amazon_books/prepare_data.py:95-97), with train rows kept in
    descending preference order so the loader's first-row val pick is
    rank-2 (main.py:201-203)."""
    import pandas as pd

    from gcn_recommendation_tpu.data.synthetic import (
        generate_synthetic_dataset,
        synthetic_bundle,
    )

    out = generate_synthetic_dataset(
        str(tmp_path / "ds"),
        num_users=120, num_items=80, num_brands=8, mean_degree=8.0,
        core=3, seed=11, style="latent", latent_dim=6, split="rank",
    )
    tr = pd.read_parquet(os.path.join(out, "train.parquet"))
    te = pd.read_parquet(os.path.join(out, "test.parquet"))
    # exactly one test row per user, and no train/test overlap per user
    assert te.groupby("user_idx").size().max() == 1
    merged = tr.merge(te, on=["user_idx", "item_idx"], how="inner")
    assert merged.empty

    # the bundle's test item must beat its val item in true preference:
    # rank-1 key >= rank-2 key by construction
    bundle, (lu, lv, pop) = synthetic_bundle(
        num_users=120, num_items=80, num_brands=8, mean_degree=8.0,
        core=3, seed=11, style="latent", latent_dim=6, split="rank",
        return_latents=True,
    )
    # the held-out item is the max-realized-key draw, so its TRUE score
    # must sit far up the user's preference distribution (vs the whole
    # catalog; rank-1 vs rank-2 is noise-separated, being adjacent order
    # statistics, so that comparison would be ~50/50 by design)
    s = lu @ lv.T + pop[None, :]
    frac = np.array([
        (s[int(u)] < s[int(u), int(i)]).mean()
        for u, i in zip(bundle.test.user_idx, bundle.test.item_idx)
    ])
    assert np.median(frac) > 0.85          # typically near the top
    assert (frac > 0.5).mean() > 0.85      # almost never below median


def test_synthetic_spectrum_weights_factor_variances():
    """spectrum > 0 decays per-factor item variance like a power law
    while keeping the total variance (temperature calibration) fixed."""
    from gcn_recommendation_tpu.data.synthetic import (
        generate_interactions_latent,
    )

    rng = np.random.default_rng(0)
    _, _, lv_flat = generate_interactions_latent(
        rng, 100, 4000, 6.0, 3, latent_dim=16, return_latents=True
    )
    rng = np.random.default_rng(0)
    _, _, lv_spec = generate_interactions_latent(
        rng, 100, 4000, 6.0, 3, latent_dim=16, spectrum=1.0,
        return_latents=True,
    )
    var_flat = lv_flat.var(axis=0)
    var_spec = lv_spec.var(axis=0)
    # first factor inflated, last deflated, total preserved
    assert var_spec[0] > 3.0 * var_flat[0]
    assert var_spec[-1] < 0.3 * var_flat[-1]
    np.testing.assert_allclose(var_spec.sum(), var_flat.sum(), rtol=0.05)


def test_synthetic_heavy_tails():
    """pop_df gives a heavier item-degree tail; deg_sigma a heavier
    user-degree tail (max/mean ratios grow)."""
    from gcn_recommendation_tpu.data.synthetic import (
        generate_interactions_latent,
    )

    def tails(pop_df, deg_sigma):
        rng = np.random.default_rng(3)
        u, i = generate_interactions_latent(
            rng, 400, 300, 10.0, 3, latent_dim=8, pop_df=pop_df,
            deg_sigma=deg_sigma,
        )
        ideg = np.bincount(i, minlength=300)
        udeg = np.bincount(u, minlength=400)
        return ideg.max() / max(1e-9, ideg.mean()), udeg.max() / udeg.mean()

    light_i, light_u = tails(None, 0.5)
    heavy_i, heavy_u = tails(2.5, 1.0)
    assert heavy_i > light_i
    assert heavy_u > 1.5 * light_u


def test_misleading_embeddings_conflict_with_taste(tmp_path):
    """emb_style='mislead' content must NOT reconstruct the item factors
    (it carries a permuted item's structure), unlike informative."""
    from gcn_recommendation_tpu.data.synthetic import (
        generate_interactions_latent,
        informative_item_embeddings,
        misleading_item_embeddings,
    )

    rng = np.random.default_rng(0)
    _, _, lv = generate_interactions_latent(
        rng, 200, 150, 8.0, 3, latent_dim=8, return_latents=True
    )

    def resid(e):
        sol, *_ = np.linalg.lstsq(e, lv, rcond=None)
        return float(np.linalg.norm(e @ sol - lv) / np.linalg.norm(lv))

    info = informative_item_embeddings(np.random.default_rng(1), lv, 16, 0.1)
    mis = misleading_item_embeddings(np.random.default_rng(1), lv, 16, 0.1)
    assert resid(info) < 0.5 < 0.8 < resid(mis)


def test_synthetic_rank_key_taste_orders_by_taste_not_popularity():
    """rank_key='taste' must (a) draw the SAME interaction set as
    rank_key='full' for the same seed (the knob only reorders rows, it
    must not change which items a user has), and (b) order each user's
    rows by the taste score u.v alone — so the rank-1 item is the
    taste-best item of the drawn set, NOT the popularity-boosted
    sampling-key winner (the rating-rank analogue: ratings reflect
    liking, not popularity — dataset/amazon_books/prepare_data.py:95-97)."""
    from gcn_recommendation_tpu.data.synthetic import (
        generate_interactions_latent,
    )

    kw = dict(num_users=150, num_items=120, mean_degree=10.0, core=3,
              latent_dim=8, pop_zipf=0.8, deg_sigma=0.8)
    rng1 = np.random.default_rng(7)
    u_f, i_f, (lu, lv, pop) = generate_interactions_latent(
        rng1, rank_key="full", return_state=True, **kw)
    rng2 = np.random.default_rng(7)
    u_t, i_t, _ = generate_interactions_latent(
        rng2, rank_key="taste", return_state=True, **kw)

    # (a) same multiset of (user, item) pairs
    key_f = np.sort(u_f.astype(np.int64) * 1_000_000 + i_f)
    key_t = np.sort(u_t.astype(np.int64) * 1_000_000 + i_t)
    np.testing.assert_array_equal(key_f, key_t)

    # (b) per-user rows are in descending TASTE order under 'taste'
    taste = lu @ lv.T
    for u in np.unique(u_t)[:50]:
        rows = i_t[u_t == u]
        vals = taste[int(u), rows]
        assert np.all(np.diff(vals) <= 1e-9)

    # and under 'full' the first row is the sampling-key winner, which
    # with a strong Zipf popularity term is typically NOT taste-best
    mismatch = 0
    for u in np.unique(u_f)[:100]:
        rows = i_f[u_f == u]
        if taste[int(u), rows[0]] < taste[int(u), rows].max() - 1e-9:
            mismatch += 1
    assert mismatch > 20


def test_synthetic_cluster_taste_style():
    """taste_style='cluster' must produce community structure: each
    user's interactions concentrate in a few item communities (the
    memorization-is-generalization property of real co-purchase data,
    REGIMES.md divergence #1), and the taste-score scale stays ~unit so
    temperature calibrations transfer between styles."""
    from gcn_recommendation_tpu.data.synthetic import (
        generate_interactions_latent,
    )

    rng = np.random.default_rng(5)
    n_comm = 25
    u, i, (lu, lv, pop) = generate_interactions_latent(
        rng, 400, 500, 12.0, 3, latent_dim=n_comm, taste_style="cluster",
        clusters_per_user=3, temperature=0.3, rank_key="taste",
        return_state=True,
    )
    assert abs(float((lu @ lv.T).std()) - 1.0) < 0.15
    # recover each item's community from its dominant loading
    comm = lv.argmax(1)
    # per-user: the top-3 communities should hold most interactions
    fracs = []
    for user in np.unique(u)[:100]:
        cs = comm[i[u == user]]
        top3 = np.sort(np.bincount(cs, minlength=n_comm))[-3:].sum()
        fracs.append(top3 / len(cs))
    assert np.median(fracs) > 0.6
