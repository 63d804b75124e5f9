from imgfact_spark.operators.topk import topk_per_group  # noqa: F401
from imgfact_spark.operators.salted import salted_count  # noqa: F401
from imgfact_spark.operators.zip_join import zip_join  # noqa: F401
from imgfact_spark.operators.connected_components import connected_components  # noqa: F401
from imgfact_spark.operators.balance import oversample_balance  # noqa: F401
