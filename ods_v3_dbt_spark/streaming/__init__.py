from .incremental import IncrementalStream, run_available_now  # noqa: F401
