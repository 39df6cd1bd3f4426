"""Plan layer: YAML pipeline compilation + the declared query catalog.

``catalog.py`` is the engine's operator contract: every operator key
from SURVEY.md §2B maps to a PySpark callable and (where expressible) an
ANSI-SQL oracle string. ``config.py``/``compiler.py`` compile the
reference's YAML pipeline shape to DataFrame lineages.
"""

from universal_data_connector_spark.plans.catalog import (  # noqa: F401
    ORACLES,
    QUERIES,
    query,
)
