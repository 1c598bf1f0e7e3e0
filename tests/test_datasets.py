"""Dataset loaders parse locally constructed fixture archives."""
import gzip
import io
import tarfile
import zipfile

import numpy as np
import pandas as pd
import pytest

from polara_tpu import datasets as ds


def _zip_bytes(members: dict) -> io.BytesIO:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zfile:
        for name, content in members.items():
            zfile.writestr(name, content)
    buf.seek(0)
    return buf


def test_movielens_legacy_format():
    ratings = "1::10::5::978300760\n1::11::3::978302109\n2::10::4::978301968\n"
    movies = "10::Movie A (1999)::Comedy|Drama\n11::Movie B (2001)::Action\n"
    archive = _zip_bytes({"ml-1m/ratings.dat": ratings,
                          "ml-1m/movies.dat": movies})
    data, genres = ds.get_movielens_data(archive, get_genres=True)
    assert list(data.columns) == ["userid", "movieid", "rating"]
    assert len(data) == 3 and data["rating"].tolist() == [5, 3, 4]
    assert set(genres.columns) == {"movieid", "movienm", "genreid"}
    assert sorted(genres.loc[genres.movieid == 10, "genreid"]) == \
        ["Comedy", "Drama"]


def test_movielens_new_format_with_time():
    ratings = ("userId,movieId,rating,timestamp\n"
               "1,10,4.0,1000\n2,11,3.5,2000\n")
    archive = _zip_bytes({"ml-latest-small/ratings.csv": ratings})
    data = ds.get_movielens_data(archive, include_time=True)
    assert list(data.columns) == ["userid", "movieid", "rating", "timestamp"]
    assert data["timestamp"].tolist() == [1000, 2000]


def test_movielens_requires_download_optin():
    with pytest.raises(ValueError, match="allow_download"):
        ds.get_movielens_data()


def test_filter_short_head():
    data = pd.DataFrame({
        "movieid": [1] * 50 + [2] * 3 + [3] * 2,
        "userid": list(range(50)) + list(range(3)) + list(range(2))})
    long_tail = ds.filter_short_head(data, threshold=0.5)
    assert 1 not in long_tail
    assert {2, 3} <= set(long_tail)


def test_netflix(tmp_path):
    inner = io.BytesIO()
    with tarfile.open(fileobj=inner, mode="w") as tar:
        for movieid, rows in [(7, "1,5,2005-09-06\n2,3,2005-09-07\n"),
                              (9, "1,4,2005-09-08\n")]:
            content = f"{movieid}:\n{rows}".encode()
            info = tarfile.TarInfo(f"training_set/mv_{movieid:07d}.txt")
            info.size = len(content)
            tar.addfile(info, io.BytesIO(content))
    inner.seek(0)

    probe = b"7:\n1\n2\n9:\n1\n"
    outer_path = tmp_path / "nf_prize_dataset.tar.gz"
    with tarfile.open(outer_path, "w:gz") as tar:
        info = tarfile.TarInfo("download/training_set.tar")
        info.size = len(inner.getvalue())
        tar.addfile(info, io.BytesIO(inner.getvalue()))
        info = tarfile.TarInfo("download/probe.txt")
        info.size = len(probe)
        tar.addfile(info, io.BytesIO(probe))

    data, probe_df = ds.get_netflix_data(outer_path, get_probe=True)
    assert set(data.columns) == {"movieid", "userid", "rating"}
    assert len(data) == 3
    assert data.loc[data.movieid == 7, "rating"].tolist() == [5, 3]
    assert probe_df["movieid"].tolist() == [7, 7, 9]


def test_bookcrossing():
    ratings = 'User-ID;ISBN;Book-Rating\n11;"0451":8\n'.replace(":", ";")
    archive = _zip_bytes({"BX-Book-Ratings.csv": ratings})
    data = ds.get_bookcrossing_data(archive)
    assert list(data.columns) == ["userid", "isbn", "rating"]


def test_amazon(tmp_path):
    csv_path = tmp_path / "ratings.csv"
    csv_path.write_text("A1,B0001,5.0,1000\nA2,B0002,3.0,2000\n")
    meta_path = tmp_path / "meta.json.gz"
    with gzip.open(meta_path, "wt") as gz:
        gz.write("{'asin': 'B0001', 'price': 9.99}\n")
        gz.write("{'asin': 'B0002', 'price': 5.00}\n")
    data, meta = ds.get_amazon_data(csv_path, meta_path)
    assert list(data.columns) == ["userid", "asin", "rating"]
    assert meta["asin"].tolist() == ["B0001", "B0002"]


def test_yahoo(tmp_path):
    folder = "ydata-ymusic-user-song-ratings-meta-v1_0"
    path = tmp_path / "yahoo.tgz"
    with tarfile.open(path, "w:gz") as tar:
        for name, content in [
                (f"{folder}/train_0.txt", "1\t100\t5\n2\t101\t3\n"),
                (f"{folder}/test_0.txt", "1\t101\t4\n"),
                (f"{folder}/song-attributes.txt", "100\t1\t2\t3\n")]:
            raw = content.encode()
            info = tarfile.TarInfo(name)
            info.size = len(raw)
            tar.addfile(info, io.BytesIO(raw))
    train, test, attrs = ds.get_yahoo_music_data(path, read_attributes=True)
    assert len(train) == 2 and len(test) == 1
    assert attrs.loc[100, "genreid"] == 3


def test_epinions_and_laplacian(tmp_path):
    ratings_path = tmp_path / "ratings_data.txt"
    ratings_path.write_text("header\n1 10 4\n2 11 3\nfooter\n")
    trust_path = tmp_path / "trust_data.txt"
    trust_path.write_text("header\n1 2 1\n2 3 1\nfooter\n")
    ratings, edges = ds.get_epinions_data(ratings_path, trust_path)
    assert ratings["rating"].tolist() == [4, 3]  # header/footer dropped
    assert len(edges) == 2

    index = pd.Index([1, 2, 3])
    lap, adj = ds.compute_graph_laplacian([(1, 2), (2, 3), (3, 3), (9, 1)],
                                          index)
    assert adj.shape == (3, 3)
    assert (adj.toarray() == adj.toarray().T).all()
    assert np.allclose(lap.toarray().sum(axis=1), 0)


def test_device_generator_as_device_matches_host_pull():
    """as_device=True returns the identical stream as the host-pulling
    path (same seed, same backend) — the zero-wire benchmark staging
    depends on this identity."""
    import jax.numpy as jnp
    from polara_tpu.datasets.synthetic import make_realistic_coo_device

    kw = dict(n_users=120, n_items=40, n_events=1500, seed=3, row_chunk=64)
    rows_h, cols_h, vals_h = make_realistic_coo_device(**kw)
    rows_d, cols_d, vals_d = make_realistic_coo_device(as_device=True, **kw)
    assert isinstance(rows_d, jnp.ndarray)
    assert vals_d.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(rows_d), rows_h)
    np.testing.assert_array_equal(np.asarray(cols_d), cols_h)
    np.testing.assert_array_equal(np.asarray(vals_d, np.float64), vals_h)
    assert bool(np.all(np.diff(np.asarray(rows_d)) >= 0))


def test_synthetic_interactions():
    data = ds.make_synthetic_interactions(n_users=50, n_items=30,
                                          n_events=400, include_time=True,
                                          seed=1)
    assert not data.duplicated(["userid", "movieid"]).any()
    assert data["rating"].between(1, 5).all()
    assert {"userid", "movieid", "rating", "timestamp"} == set(data.columns)
    # deterministic under the same seed
    again = ds.make_synthetic_interactions(n_users=50, n_items=30,
                                           n_events=400, include_time=True,
                                           seed=1)
    pd.testing.assert_frame_equal(data, again)
