from .partitioning import spread
from .inspect import explain_str, physical_summary

__all__ = ["spread", "explain_str", "physical_summary"]
