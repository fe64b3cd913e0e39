from pygeodatacrawler_spark.functions.urls import (  # noqa: F401
    canonicalize_url,
    canonicalize_url_py,
    registered_domain,
    registered_domain_py,
    safe_filename,
    safe_filename_py,
    url_depth,
    url_depth_py,
    url_hash,
)
from pygeodatacrawler_spark.functions.text import (  # noqa: F401
    extract_links_py,
    extract_links_udf,
    extract_text_py,
    extract_text_udf,
)
from pygeodatacrawler_spark.functions.hashes import md5_long  # noqa: F401
