"""Query registry package — importing this populates REGISTRY."""

from .registry import REGISTRY, QuerySpec, register  # noqa: F401

# Each module registers its queries at import time.
from . import tpch  # noqa: F401, E402
from . import tpch_extended  # noqa: F401, E402
from . import tpch_gap  # noqa: F401, E402
from . import events_queries  # noqa: F401, E402
from . import docs_queries  # noqa: F401, E402
from . import analytics_ext  # noqa: F401, E402
from . import ml_queries  # noqa: F401
from . import stat_queries  # noqa: F401, E402, E402
from . import ir_queries  # noqa: F401, E402
from . import warehouse_queries  # noqa: F401, E402
from . import source_queries  # noqa: F401, E402
from . import pipeline_ext  # noqa: F401, E402
from . import stat_tests  # noqa: F401, E402
from . import marketing  # noqa: F401, E402
from . import risk_queries  # noqa: F401, E402
from . import eval_ext  # noqa: F401, E402
from . import causal_queries  # noqa: F401, E402
from . import sketch_ext  # noqa: F401, E402
from . import series_ext  # noqa: F401, E402
from . import ops_ext  # noqa: F401, E402
from . import experiment_queries  # noqa: F401, E402
from . import series_mining  # noqa: F401, E402
from . import graph_ext  # noqa: F401, E402
from . import fitting_queries  # noqa: F401, E402
from . import projection_queries  # noqa: F401, E402
from . import inference_ext  # noqa: F401, E402
from . import transform_queries  # noqa: F401, E402
from . import recsys_queries  # noqa: F401, E402
from . import selection_queries  # noqa: F401, E402
from . import lm_ext  # noqa: F401, E402
from . import valuation_queries  # noqa: F401, E402
from . import linkage_queries  # noqa: F401, E402

__all__ = ["REGISTRY", "QuerySpec", "register"]
