from .progress import progress_snapshot, serve_dashboard

__all__ = ["progress_snapshot", "serve_dashboard"]
