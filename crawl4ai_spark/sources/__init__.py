"""Sources: the synthetic web (the sandbox stand-in for the network),
the synthetic fetch operator, and robots.txt acquisition.

The reference's `raw:` scheme injects literal HTML in place of a
network fetch (async_crawler_strategy.py:2281-2286); our synthetic
pages table is the distributed version of the same idea — the fetch
operator joins the admitted frontier batch against it with identical
semantics (status codes, redirects, latency) and the same code path a
real aiohttp-backed fetch UDF would slot into."""
