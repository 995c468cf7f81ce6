"""Testing support: the pure-Python crawl simulator (the parity
oracle for crawl ordering / seen-set / span equality) and shared
fixtures."""
