"""HTTP cache policies (SURVEY §2.1 S7) — the decision kernels of the
reference's DummyPolicy and RFC2616Policy (`scrapy/extensions/httpcache.py:
30-245`), re-expressed as pure functions over (status, header) columns.

The reference binds these decisions to a live downloader middleware +
storage backend; here the page table IS the cache (COVERAGE S7), so what
remains policy-shaped — *should this response be stored*, *how long is it
fresh*, *is the cached copy still usable* — becomes a batch kernel that a
recrawl scheduler runs over the page store to pick refetch candidates.
Freshness math follows the reference's Mozilla-derived formulas
(`httpcache.py:193-245`): max-age → Expires−Date → (Date−Last-Modified)/10
heuristic → one-year fallback for 300/301/308; current age is
max(now−Date, Age header).

All timestamps are explicit parameters (`now` is a column/argument, never
``time.time()``) so decisions are deterministic and resumable — at 100 TB
a refetch sweep must produce the same candidate set on retry.
"""

from __future__ import annotations

import pyarrow as pa

from scrupyst_ray.functions.httpmeta import parse_cachecontrol, rfc1123_to_epoch

MAXAGE = 3600 * 24 * 365  # reference RFC2616Policy.MAXAGE (one year)

# DummyPolicy defaults (reference `httpcache.py:30-57` + default_settings):
# cache everything whose scheme/status is not explicitly ignored.
DUMMY_IGNORE_SCHEMES = ("file",)


def dummy_should_cache_request(url: str, ignore_schemes=DUMMY_IGNORE_SCHEMES) -> bool:
    scheme = url.split(":", 1)[0].lower() if ":" in url else ""
    return scheme not in ignore_schemes


def dummy_should_cache_response(status: int, ignore_http_codes=()) -> bool:
    return status not in ignore_http_codes


def rfc2616_should_cache_request(url: str, req_cc: str | None) -> bool:
    """`should_cache_request` (`httpcache.py:84-89`): obey the user-agent's
    ``Cache-Control: no-store``; file-scheme requests never cache."""
    if not dummy_should_cache_request(url):
        return False
    return b"no-store" not in parse_cachecontrol(req_cc or "")


def rfc2616_should_cache_response(
    status: int,
    resp_cc: str | None,
    has_expires: bool,
    has_last_modified: bool,
    has_etag: bool,
    always_store: bool = False,
) -> bool:
    """`should_cache_response` (`httpcache.py:91-116`), exact branch order:
    no-store → never; 304 → never; always_store → yes; max-age/Expires →
    yes; 300/301/308 → yes (Firefox one-year fallback); 200/203/401 → only
    with a validator (Last-Modified or ETag); anything else → no."""
    cc = parse_cachecontrol(resp_cc or "")
    if b"no-store" in cc:
        return False
    if status == 304:
        return False
    if always_store:
        return True
    if b"max-age" in cc or has_expires:
        return True
    if status in (300, 301, 308):
        return True
    if status in (200, 203, 401):
        return has_last_modified or has_etag
    return False


def _max_age(cc: dict) -> int | None:
    try:
        return max(0, int(cc[b"max-age"]))
    except (KeyError, ValueError, TypeError):
        return None


def freshness_lifetime(
    status: int,
    resp_cc: str | None,
    date: str | None,
    expires: str | None,
    last_modified: str | None,
    now: float,
) -> float:
    """`_compute_freshness_lifetime` (`httpcache.py:193-224`): max-age wins;
    else Expires−Date (unparseable Expires ⇒ already expired, RFC 2616
    §14.21); else the (Date−Last-Modified)/10 Firefox heuristic; else one
    year for 300/301/308; else 0 (uncacheable without revalidation)."""
    cc = parse_cachecontrol(resp_cc or "")
    maxage = _max_age(cc)
    if maxage is not None:
        return float(maxage)
    date_e = rfc1123_to_epoch(date) or now
    if expires is not None:
        exp_e = rfc1123_to_epoch(expires)
        return float(max(0, exp_e - date_e)) if exp_e else 0.0
    lm = rfc1123_to_epoch(last_modified)
    if lm and lm <= date_e:
        return (date_e - lm) / 10
    if status in (300, 301, 308):
        return float(MAXAGE)
    return 0.0


def current_age(date: str | None, age_header: str | None, now: float) -> float:
    """`_compute_current_age` (`httpcache.py:226-244`): max of the clock age
    (now−Date; missing Date ⇒ assume synced clocks, age 0) and the Age
    header (non-numeric Age ignored)."""
    age: float = 0.0
    date_e = rfc1123_to_epoch(date) or now
    if now > date_e:
        age = now - date_e
    if age_header is not None:
        try:
            age = max(age, int(age_header))
        except ValueError:
            pass
    return age


def is_cached_response_fresh(
    status: int,
    resp_cc: str | None,
    req_cc: str | None,
    date: str | None,
    expires: str | None,
    last_modified: str | None,
    age_header: str | None,
    now: float,
) -> bool:
    """`is_cached_response_fresh` (`httpcache.py:118-160`): no-cache on
    either side ⇒ stale; request max-age caps the lifetime; request
    max-stale (valueless = any staleness, valued = that many extra seconds)
    extends it unless the response says must-revalidate."""
    cc = parse_cachecontrol(resp_cc or "")
    ccreq = parse_cachecontrol(req_cc or "")
    if b"no-cache" in cc or b"no-cache" in ccreq:
        return False
    lifetime = freshness_lifetime(status, resp_cc, date, expires, last_modified, now)
    age = current_age(date, age_header, now)
    reqmaxage = _max_age(ccreq)
    if reqmaxage is not None:
        lifetime = min(lifetime, reqmaxage)
    if age < lifetime:
        return True
    if b"max-stale" in ccreq and b"must-revalidate" not in cc:
        stale = ccreq[b"max-stale"]
        if stale is None:
            return True
        try:
            if age < lifetime + max(0, int(stale)):
                return True
        except ValueError:
            pass
    return False


def is_cached_response_valid(cached_cc: str | None, new_status: int) -> bool:
    """`is_cached_response_valid` (`httpcache.py:162-172`): a 304 always
    revalidates the cached copy; a 5xx does too unless the cached response
    demanded must-revalidate."""
    if new_status >= 500:
        if b"must-revalidate" not in parse_cachecontrol(cached_cc or ""):
            return True
    return new_status == 304


def conditional_validators(
    last_modified: str | None, etag: str | None
) -> dict[str, str]:
    """`_set_conditional_validators` (`httpcache.py:174-182`): the headers a
    revalidation request would carry for a stale cached response."""
    out: dict[str, str] = {}
    if last_modified is not None:
        out["If-Modified-Since"] = last_modified
    if etag is not None:
        out["If-None-Match"] = etag
    return out


def cache_policy_batch(batch: pa.Table, now: float) -> pa.Table:
    """Batch kernel: header columns → RFC2616 decisions.

    Expects columns ``status:int64, resp_cc, req_cc, date, expires,
    last_modified, etag, age_header`` (strings, null = header absent) and
    appends ``should_cache:bool, lifetime:double, age:double, fresh:bool``.
    Header strings are tiny (~100 B) metadata — this is a narrow stage, not
    a payload stage, so the per-row parse loop is cheap; the payloads the
    decisions govern never enter the batch."""
    st = batch["status"].to_pylist()
    rcc = batch["resp_cc"].to_pylist()
    qcc = batch["req_cc"].to_pylist()
    dt = batch["date"].to_pylist()
    ex = batch["expires"].to_pylist()
    lm = batch["last_modified"].to_pylist()
    et = batch["etag"].to_pylist()
    ah = batch["age_header"].to_pylist()
    should, life, age, fresh = [], [], [], []
    for s, rc, qc, d, e, l, t, a in zip(st, rcc, qcc, dt, ex, lm, et, ah):
        should.append(
            rfc2616_should_cache_response(
                s, rc, e is not None, l is not None, t is not None
            )
        )
        life.append(freshness_lifetime(s, rc, d, e, l, now))
        age.append(current_age(d, a, now))
        fresh.append(is_cached_response_fresh(s, rc, qc, d, e, l, a, now))
    return (
        batch.append_column("should_cache", pa.array(should, pa.bool_()))
        .append_column("lifetime", pa.array(life, pa.float64()))
        .append_column("age", pa.array(age, pa.float64()))
        .append_column("fresh", pa.array(fresh, pa.bool_()))
    )
