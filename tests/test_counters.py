"""Capacity-truncation observability (round-2 audit of silent caps):
truncations keep the best-observed points, warn once, and are counted."""
import warnings

import numpy as np

from orb_slam2_detailed_comments_tpu.utils import counters


class TestCounters:
    def setup_method(self):
        counters.reset()

    def test_keep_best_observed_orders_and_counts(self):
        n_obs = np.zeros(100, np.int32)
        ids = np.arange(40, 60)
        n_obs[ids] = np.arange(20)  # id 59 most observed
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            kept = counters.keep_best_observed(ids, n_obs, 5, "test.site")
        assert kept.size == 5
        assert set(kept) == {55, 56, 57, 58, 59}
        snap = counters.snapshot()
        assert snap["test.site"] == {"events": 1, "dropped": 15}

    def test_no_truncation_no_count(self):
        n_obs = np.zeros(10, np.int32)
        ids = np.arange(4)
        kept = counters.keep_best_observed(ids, n_obs, 8, "test.site2")
        np.testing.assert_array_equal(kept, ids)
        assert "test.site2" not in counters.snapshot()

    def test_warns_once_per_site(self):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            counters.truncated("test.site3", 3)
            counters.truncated("test.site3", 4)
        assert len(w) == 1
        assert counters.snapshot()["test.site3"] == {"events": 2, "dropped": 7}
