"""Instrumented transports for tests (importable on executor workers —
test-module classes can't unpickle there)."""

from __future__ import annotations

import time

from crawl4ai_spark.sources.fetch import SyntheticTransport


class RecordingTransport(SyntheticTransport):
    """Synthetic transport that appends (monotonic_ts, url) per fetch
    to a log file — readable from the test even though the UDF runs in
    a separate Python worker process."""

    def __init__(self, log_path: str, n_hosts: int = 3, n_pages: int = 6):
        pages = {
            f"https://h{h}.test/p{i}": {"status_code": 200, "html": "<p>x</p>",
                                        "redirect_to": None}
            for h in range(n_hosts) for i in range(n_pages)
        }
        super().__init__(pages)
        self.log_path = log_path

    def fetch_batch(self, urls):
        with open(self.log_path, "a") as f:
            for u in urls:
                f.write(f"{time.monotonic():.6f}\t{u}\n")
                f.flush()
        return super().fetch_batch(urls)
