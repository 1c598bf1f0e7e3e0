"""Data-model mixins for alternative evaluation protocols.

``SampledEvaluationMixin`` reproduces the reference's sampled-candidate
protocol (``polara/recommender/data.py:938-994``): each test user is scored
on their holdout items plus a fixed-size list of unseen items, instead of the
full catalog — the EigenRec/NCF-style evaluation.
"""
from __future__ import annotations

import numpy as np
import pandas as pd


class SampledEvaluationMixin:
    """Adds per-user unseen-interaction lists for sampled evaluation."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.unseen_interactions = None
        self.unseen_items_num = None
        self._holdout_item_prefix = "x"

    def adapt_holdout(self) -> None:
        """Rebase holdout item ids to a per-user 0..h-1 column.

        Holdout items occupy the first columns of the sampled score matrix,
        so their "item index" is just their position within the user's
        holdout.
        """
        holdout = self.test.holdout
        userid = self.fields.userid
        itemid = self.fields.itemid
        position = holdout.groupby(userid, sort=False)[itemid] \
                          .transform("cumcount")
        holdout.loc[:, f"{self._holdout_item_prefix}_{itemid}"] = position

    def set_unseen_interactions(self, interactions: pd.Series,
                                reindex: bool = True,
                                warm_start: bool = False) -> None:
        n_unseen = len(interactions.iloc[0])
        if not interactions.apply(len).eq(n_unseen).all():
            raise ValueError("Number of unseen items per user must be equal")
        if reindex:
            if warm_start:
                raise NotImplementedError(
                    "Sampled evaluation with warm start is not supported yet")
            userid = self.fields.userid
            itemid = self.fields.itemid
            user_map = self.get_entity_index(userid).set_index("old").new
            interactions = interactions.loc[user_map.index]
            new_users = pd.Index(interactions.index.map(user_map),
                                 name=userid)
            if new_users.isnull().any():
                raise IndexError("Input is inconsistent with existing data.")
            item_map = self.get_entity_index(itemid).set_index("old").new
            interactions = pd.Series(
                index=new_users,
                data=[item_map.loc[items].values for items in
                      interactions.values],
                name=itemid)
        self.unseen_interactions = interactions
        self.unseen_items_num = n_unseen
        self.adapt_holdout()


class LongTailMixin:
    """Restrict the holdout to long-tail items.

    Declared for API parity; like the reference (``data.py:997-999``) the
    implementation is not available yet.
    """

    def __init__(self, *args, **kwargs):
        raise NotImplementedError("Long-tail holdout is not implemented")
