"""Dataset loaders (reference ``polara/datasets/``).

Each loader parses a locally available archive into pandas DataFrames with
the canonical ``userid / itemid / feedback`` column layout expected by
:class:`polara_tpu.data.RecommenderData`.  Downloading is opt-in
(``allow_download=True``) — the loaders are written local-first since
production environments typically stage data out of band.
"""
from polara_tpu.datasets.amazon import get_amazon_data
from polara_tpu.datasets.bookcrossing import get_bookcrossing_data
from polara_tpu.datasets.epinions import (compute_graph_laplacian,
                                          get_epinions_data)
from polara_tpu.datasets.movielens import (filter_short_head,
                                           get_movielens_data,
                                           get_split_genres)
from polara_tpu.datasets.netflix import get_netflix_data
from polara_tpu.datasets.synthetic import (make_realistic_coo,
                                           make_realistic_interactions,
                                           make_synthetic_interactions)
from polara_tpu.datasets.yahoo import get_yahoo_music_data

__all__ = ["get_amazon_data", "get_bookcrossing_data", "get_epinions_data",
           "compute_graph_laplacian", "get_movielens_data",
           "get_split_genres", "filter_short_head", "get_netflix_data",
           "get_yahoo_music_data", "make_synthetic_interactions",
           "make_realistic_coo", "make_realistic_interactions"]
