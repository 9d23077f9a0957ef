"""Device-mesh parallelism: pure data parallelism over game instances."""
