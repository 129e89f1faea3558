"""Task suites: the seven workloads of the reference, on the shared core."""
