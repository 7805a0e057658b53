"""RFC2616 cache-policy kernel semantics (reference
`scrapy/extensions/httpcache.py:30-245`) — branch-order matrix."""

from __future__ import annotations

import pyarrow as pa

from scrupyst_ray.functions.httpcachepolicy import (
    MAXAGE,
    cache_policy_batch,
    conditional_validators,
    current_age,
    dummy_should_cache_request,
    dummy_should_cache_response,
    freshness_lifetime,
    is_cached_response_fresh,
    is_cached_response_valid,
    rfc2616_should_cache_request,
    rfc2616_should_cache_response,
)
from scrupyst_ray.functions.httpmeta import rfc1123_to_epoch

DATE = "Sun, 01 Jun 1997 08:30:00 GMT"
DATE_E = rfc1123_to_epoch(DATE)


class TestShouldCacheResponse:
    def _sc(self, status, cc=None, exp=False, lm=False, etag=False, always=False):
        return rfc2616_should_cache_response(status, cc, exp, lm, etag, always)

    def test_no_store_wins_even_over_always_store(self):
        # reference checks no-store BEFORE always_store (httpcache.py:95-103)
        assert not self._sc(200, "no-store, max-age=300", always=True)

    def test_304_never_cached(self):
        # branch order: no-store → 304 → always_store, so 304 beats every
        # expiration hint AND always_store (httpcache.py:99-103)
        assert not self._sc(304, "max-age=600", exp=True, etag=True, always=True)
        assert not self._sc(304, None, always=True)
        assert not self._sc(304, "public", exp=True)

    def test_expiration_hints_cache(self):
        assert self._sc(404, "max-age=0")  # any max-age counts as a hint
        assert self._sc(404, None, exp=True)

    def test_redirects_cache_without_hints(self):
        for status in (300, 301, 308):
            assert self._sc(status)
        assert not self._sc(302)
        assert not self._sc(307)

    def test_ok_statuses_need_a_validator(self):
        for status in (200, 203, 401):
            assert not self._sc(status)
            assert self._sc(status, lm=True)
            assert self._sc(status, etag=True)

    def test_other_statuses_never(self):
        assert not self._sc(404, lm=True, etag=True)
        assert not self._sc(500, lm=True, etag=True)

    def test_request_side(self):
        assert rfc2616_should_cache_request("http://a.test/", None)
        assert not rfc2616_should_cache_request("http://a.test/", "no-store")
        assert not rfc2616_should_cache_request("file:///etc/passwd", None)
        assert dummy_should_cache_request("http://a.test/")
        assert not dummy_should_cache_request("file:///x")
        assert dummy_should_cache_response(500)
        assert not dummy_should_cache_response(500, ignore_http_codes=(500,))


class TestFreshnessLifetime:
    def test_max_age_wins_over_expires(self):
        exp = "Sun, 01 Jun 1997 08:32:00 GMT"
        assert (
            freshness_lifetime(200, "max-age=60", DATE, exp, None, DATE_E + 1) == 60.0
        )

    def test_negative_max_age_clamps_to_zero(self):
        assert freshness_lifetime(200, "max-age=-5", DATE, None, None, 0) == 0.0

    def test_expires_minus_date(self):
        exp = "Sun, 01 Jun 1997 08:32:00 GMT"
        assert freshness_lifetime(200, None, DATE, exp, None, 0) == 120.0

    def test_unparseable_expires_means_expired(self):
        # RFC 2616 §14.21 (reference httpcache.py:210-212)
        assert freshness_lifetime(200, None, DATE, "garbage", None, 0) == 0.0

    def test_last_modified_heuristic_tenth(self):
        lm = "Sun, 01 Jun 1997 08:13:20 GMT"  # 1000 s before Date
        assert freshness_lifetime(200, None, DATE, None, lm, 0) == 100.0

    def test_future_last_modified_ignored(self):
        lm = "Sun, 01 Jun 1997 09:30:00 GMT"  # AFTER Date
        assert freshness_lifetime(200, None, DATE, None, lm, 0) == 0.0
        assert freshness_lifetime(301, None, DATE, None, lm, 0) == float(MAXAGE)

    def test_redirect_one_year_fallback(self):
        for status in (300, 301, 308):
            assert freshness_lifetime(status, None, DATE, None, None, 0) == float(
                MAXAGE
            )
        assert freshness_lifetime(200, None, DATE, None, None, 0) == 0.0

    def test_missing_date_synthesizes_now(self):
        lm_e = DATE_E - 1000
        lm = "Sun, 01 Jun 1997 08:13:20 GMT"
        # date=None → date:=now; heuristic over (now - lm)
        assert freshness_lifetime(200, None, None, None, lm, DATE_E) == 100.0


class TestCurrentAge:
    def test_clock_age(self):
        assert current_age(DATE, None, DATE_E + 90) == 90.0

    def test_age_header_max(self):
        assert current_age(DATE, "200", DATE_E + 90) == 200.0
        assert current_age(DATE, "10", DATE_E + 90) == 90.0

    def test_invalid_age_ignored(self):
        assert current_age(DATE, "soon", DATE_E + 90) == 90.0

    def test_missing_date_assumes_synced_clock(self):
        assert current_age(None, None, 1e9) == 0.0
        assert current_age(None, "42", 1e9) == 42.0


class TestFresh:
    def _fresh(self, resp_cc=None, req_cc=None, age_s=90, lifetime_cc="max-age=600"):
        return is_cached_response_fresh(
            200, resp_cc or lifetime_cc, req_cc, DATE, None, None, None, DATE_E + age_s
        )

    def test_within_lifetime(self):
        assert self._fresh(age_s=90)
        assert not self._fresh(age_s=600)

    def test_no_cache_either_side(self):
        assert not self._fresh(resp_cc="no-cache, max-age=600")
        assert not self._fresh(req_cc="no-cache")

    def test_request_max_age_caps(self):
        assert not self._fresh(req_cc="max-age=60", age_s=90)
        assert self._fresh(req_cc="max-age=120", age_s=90)

    def test_max_stale_unlimited(self):
        assert self._fresh(req_cc="max-stale", age_s=10_000)

    def test_max_stale_bounded(self):
        assert self._fresh(req_cc="max-stale=30", age_s=620)
        assert not self._fresh(req_cc="max-stale=10", age_s=620)

    def test_max_stale_blocked_by_must_revalidate(self):
        assert not self._fresh(
            resp_cc="max-age=600, must-revalidate", req_cc="max-stale", age_s=10_000
        )

    def test_max_stale_garbage_value(self):
        assert not self._fresh(req_cc="max-stale=soon", age_s=10_000)


class TestValidAndValidators:
    def test_304_revalidates(self):
        assert is_cached_response_valid(None, 304)
        assert not is_cached_response_valid(None, 200)

    def test_5xx_keeps_cache_unless_must_revalidate(self):
        assert is_cached_response_valid(None, 503)
        assert not is_cached_response_valid("must-revalidate", 503)

    def test_conditional_validators(self):
        assert conditional_validators("lm", '"e"') == {
            "If-Modified-Since": "lm",
            "If-None-Match": '"e"',
        }
        assert conditional_validators(None, None) == {}


class TestBatchKernel:
    def test_columns_and_one_row(self):
        b = pa.table(
            {
                "status": pa.array([200, 301], pa.int64()),
                "resp_cc": pa.array(["max-age=600", None]),
                "req_cc": pa.array([None, None]),
                "date": pa.array([DATE, DATE]),
                "expires": pa.array([None, None], pa.string()),
                "last_modified": pa.array([None, None], pa.string()),
                "etag": pa.array(['"x"', None]),
                "age_header": pa.array([None, None], pa.string()),
            }
        )
        out = cache_policy_batch(b, DATE_E + 90)
        assert out["should_cache"].to_pylist() == [True, True]
        assert out["lifetime"].to_pylist() == [600.0, float(MAXAGE)]
        assert out["age"].to_pylist() == [90.0, 90.0]
        assert out["fresh"].to_pylist() == [True, True]
