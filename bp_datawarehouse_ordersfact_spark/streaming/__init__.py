from .jobs import run_tumbling_agg_availablenow

__all__ = ["run_tumbling_agg_availablenow"]
