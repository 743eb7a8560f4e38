"""Driver-side plans: the iterative crawl round loop."""
