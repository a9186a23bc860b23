"""Rate-limited, retrying REST client — the ingestion substrate (S1/S2/T4).

Stdlib-only (urllib) so it imports on any executor without extra deps; the
reference uses ``requests`` but needs nothing beyond GET + params
(run_ac_extraction.py:203-217). Faithfully re-expresses the reference's
operational behavior:

- token-bucket rate limit (reference: fixed ``rate_sleep=0.25`` ≈ 4 req/s
  under the API's 5 req/s cap, :42; a bucket smooths bursts better at the
  same average rate),
- exponential backoff ``base·2ⁿ`` capped, retrying 429/5xx/URLError
  (:203-217, 6 attempts, cap 30 s),
- graceful 404 → ``None`` (callers emit empty tables, :374-382,562-567),
- offset pagination stopping on a short page (:222-247),
- keyset cursor ``id_greater`` scan (:249-270).

On a cluster each reader partition builds its own client; set ``rate`` to
(global budget / max concurrent partitions) so the fleet respects the API
cap (SURVEY.md §7: "partition the id space and rate-limit per partition
with a global budget").
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request


class RateLimiter:
    """Token bucket: ``rate`` requests/second average, ``burst`` max."""

    def __init__(self, rate: float = 4.0, burst: int = 4):
        self.rate = rate
        self.burst = burst
        self._tokens = float(burst)
        self._last = time.monotonic()

    def acquire(self) -> None:
        now = time.monotonic()
        self._tokens = min(self.burst, self._tokens + (now - self._last) * self.rate)
        self._last = now
        if self._tokens < 1.0:
            wait = (1.0 - self._tokens) / self.rate
            time.sleep(wait)
            # the token accrued during the sleep is the one being consumed
            self._last = time.monotonic()
            self._tokens = 0.0
        else:
            self._tokens -= 1.0


class RestClient:
    RETRY_STATUSES = frozenset({429, 500, 502, 503, 504})

    def __init__(
        self,
        base_url: str,
        rate: float = 4.0,
        retries: int = 6,
        backoff: float = 0.5,
        backoff_cap: float = 30.0,
        timeout: float = 60.0,
        headers: dict[str, str] | None = None,
    ):
        self.base_url = base_url.rstrip("/")
        self.limiter = RateLimiter(rate)
        self.retries = retries
        self.backoff = backoff
        self.backoff_cap = backoff_cap
        self.timeout = timeout
        self.headers = headers or {}

    # ------------------------------------------------------------ low level

    def get_json(self, path: str, params: dict | None = None) -> dict | None:
        """GET → parsed JSON; ``None`` on 404; retries 429/5xx with backoff."""
        url = f"{self.base_url}/{path.lstrip('/')}"
        if params:
            url += "?" + urllib.parse.urlencode(params)
        last_err: Exception | None = None
        for attempt in range(self.retries + 1):
            self.limiter.acquire()
            try:
                req = urllib.request.Request(url, headers=self.headers)
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    return json.loads(resp.read().decode("utf-8"))
            except urllib.error.HTTPError as e:
                if e.code == 404:
                    return None
                if e.code not in self.RETRY_STATUSES:
                    raise
                last_err = e
            except urllib.error.URLError as e:
                last_err = e
            time.sleep(min(self.backoff * (2**attempt), self.backoff_cap))
        raise RuntimeError(f"GET {url} failed after {self.retries + 1} attempts: {last_err}")

    # ----------------------------------------------------------- pagination

    def paged(
        self,
        path: str,
        collection: str,
        params: dict | None = None,
        page_limit: int = 100,
        offset_start: int = 0,
        offset_stop: int | None = None,
    ) -> "list[dict]":
        """Offset-paginated scan (S1): stops on short/empty page or at
        ``offset_stop`` (exclusive) so id-space partitions do not overlap."""
        out: list[dict] = []
        offset = offset_start
        while offset_stop is None or offset < offset_stop:
            limit = page_limit
            if offset_stop is not None:
                limit = min(limit, offset_stop - offset)
            q = dict(params or {})
            q.update({"limit": limit, "offset": offset})
            payload = self.get_json(path, q)
            rows = (payload or {}).get(collection, [])
            out.extend(rows)
            if len(rows) < limit:
                break
            offset += len(rows)
        return out

    def keyset(
        self,
        path: str,
        collection: str,
        id_field: str = "id",
        id_greater: int = 0,
        page_limit: int = 100,
        max_pages: int | None = None,
    ) -> tuple[list[dict], int]:
        """Keyset-cursor scan (S2, :249-270): ascending id pages, returns
        (rows, advanced cursor). Bounded by ``max_pages`` per call so a
        streaming micro-batch stays small."""
        out: list[dict] = []
        cursor = id_greater
        pages = 0
        while max_pages is None or pages < max_pages:
            params = {
                "id_greater": cursor,
                "orders[id]": "ASC",
                "limit": page_limit,
                "offset": 0,
            }
            payload = self.get_json(path, params)
            rows = (payload or {}).get(collection, [])
            if not rows:
                break
            out.extend(rows)
            cursor = max(int(r[id_field]) for r in rows)
            pages += 1
            if len(rows) < page_limit:
                break
        return out, cursor

    def total(self, path: str, params: dict | None = None) -> int | None:
        """Collection size probe via ``meta.total`` (limit-1 request)."""
        q = dict(params or {})
        q.update({"limit": 1, "offset": 0})
        payload = self.get_json(path, q)
        if payload is None:
            return None
        meta = payload.get("meta") or {}
        t = meta.get("total")
        return int(t) if t is not None else None
