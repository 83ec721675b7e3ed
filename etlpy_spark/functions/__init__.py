from etlpy_spark.functions.expr import attr_expr, compile_python_script  # noqa: F401
from etlpy_spark.functions.url import canonicalize_url, canonicalize_url_expr, url_host  # noqa: F401
