"""Pure (driver/executor-agnostic) scalar semantics shared by the pandas
UDF operators and the test oracle's independent reimplementation checks."""

from pii_detector_spark.functions.masking import (  # noqa: F401
    hash_value,
    is_custom_entity,
    mask_value,
    region_of,
)
from pii_detector_spark.functions.textnorm import (  # noqa: F401
    extract_text_from_html,
    render_html,
)
