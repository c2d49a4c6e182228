"""deepicedrain_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of weiji14/deepicedrain,
re-expressed Spark-first (DataFrame/SQL/Catalyst). See SURVEY.md."""

from deepicedrain_spark.region import Region
from deepicedrain_spark.session import get_spark

__all__ = ["Region", "get_spark"]
__version__ = "0.1.0"
