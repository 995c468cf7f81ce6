"""Per-document extraction: HTML → cleaned tree → links / media /
metadata / markdown / interleaved text+media spans.

The pure-Python core (htmlparse.py, markdown.py) is shared verbatim by
the Spark pandas UDFs (udfs.py) and the pure-Python crawl simulator
(crawl4ai_spark.testing.simulator) so that Spark-vs-oracle span parity
holds by construction; the semantics themselves are a clean-room
re-expression of the reference extractor
(/root/reference/crawl4ai/content_scraping_strategy.py — scrape E1,
media E2, metadata E3; markdown_generation_strategy.py — markdown E4 +
citations; SURVEY.md §2.8)."""
