from ocr_ray.core.extract import (  # noqa: F401
    Block,
    ExtractResult,
    classify_payload,
    extract_turn,
)
