from etlpy_spark.plans.spec import (  # noqa: F401
    CrawlerSpec,
    CrawlItem,
    EtlModule,
    ProjectSpec,
    Stage,
    load_project_json,
    load_project_xml,
)
from etlpy_spark.plans.compiler import CompileContext, compile_module, compile_stages  # noqa: F401
