"""Step I/O validation kernel (W6 — SURVEY.md §2.7).

Behavior-equivalent to the reference's ``StepValidator``
(`/root/reference/crawler/services/step_validator.py`, 397 LoC of pydantic
models) without pydantic: the semantic checks on step inputs (URL-list
shape) and outputs (extracted-data/metadata shape, scrape statistics),
strict-vs-warn modes, and required-field reporting. Spark's StructType
enforcement covers the *typed* half of W6; this kernel covers the residual
semantic half the orchestrator applies per step, driver-side.

Contract (step_validator.py:215-283, 284-357, 358-397):
  * input, crawl step: ``url`` is a non-empty string, or a non-empty list
    whose FIRST element is a non-empty string (seed = first);
  * input, scrape step: ``urls`` is a non-empty string, or a non-empty list
    of ALL non-empty strings;
  * output, crawl step: ``extracted_data`` is a non-empty dict; ``metadata``
    (if present) is a dict;
  * output, scrape step: ``extracted_data`` is a dict; an ``items`` field
    must be a list (may be empty — all URLs failing is legal, P7); if ALL of
    total_urls/successful_urls/failed_urls appear in metadata they must be
    non-negative ints;
  * strict=True -> raise StepValidationError with every error collected;
    strict=False -> return the errors, caller logs and proceeds (input
    defaults strict, output defaults warn — worker.py wiring).
"""

from __future__ import annotations

from typing import Any


class StepValidationError(ValueError):
    def __init__(self, step_name: str, errors: list[str], validation_type: str = "input"):
        self.step_name = step_name
        self.errors = errors
        self.validation_type = validation_type
        super().__init__(
            f"{validation_type} validation failed for step '{step_name}': "
            + "; ".join(errors)
        )


def _check_url_value(v: Any, all_elements: bool) -> list[str]:
    errors: list[str] = []
    if isinstance(v, str):
        if not v.strip():
            errors.append("URL cannot be empty string")
    elif isinstance(v, list):
        if not v:
            errors.append("URL list cannot be empty")
        elif all_elements:
            for i, url in enumerate(v):
                if not isinstance(url, str):
                    errors.append(
                        f"URL at index {i} must be a string, got {type(url).__name__}"
                    )
                elif not url.strip():
                    errors.append(f"URL at index {i} cannot be empty string")
        else:
            if not isinstance(v[0], str):
                errors.append("First URL in list must be a string")
            elif not v[0].strip():
                errors.append("First URL in list cannot be empty string")
    else:
        errors.append(f"URL must be a string or list, got {type(v).__name__}")
    return errors


def validate_input(
    step_name: str, step_type: str, data: dict[str, Any], strict: bool = True
) -> list[str]:
    """-> error list (empty == valid); raises StepValidationError if strict."""
    errors: list[str] = []
    if step_type == "crawl":
        if "url" not in data:
            errors.append("crawl step requires 'url'")
        else:
            errors.extend(_check_url_value(data["url"], all_elements=False))
    elif step_type == "scrape":
        if "urls" not in data:
            errors.append("scrape step requires 'urls'")
        else:
            errors.extend(_check_url_value(data["urls"], all_elements=True))
    if errors and strict:
        raise StepValidationError(step_name, errors, "input")
    return errors


def validate_output(
    step_name: str, step_type: str, data: dict[str, Any], strict: bool = False
) -> list[str]:
    errors: list[str] = []
    extracted = data.get("extracted_data")
    metadata = data.get("metadata", {})
    if not isinstance(extracted, dict):
        errors.append("Extracted data must be a dictionary")
    elif step_type == "crawl" and not extracted:
        errors.append("Crawl step must extract at least one field")
    elif step_type == "scrape" and "items" in extracted and not isinstance(
        extracted["items"], list
    ):
        errors.append("'items' field must be a list")
    if not isinstance(metadata, dict):
        errors.append("Metadata must be a dictionary")
    elif step_type == "scrape":
        stats = {"total_urls", "successful_urls", "failed_urls"}
        if stats.issubset(metadata.keys()):
            for f in sorted(stats):
                v = metadata[f]
                if not isinstance(v, int) or isinstance(v, bool) or v < 0:
                    errors.append(
                        f"Metadata field '{f}' must be a non-negative integer"
                    )
    if errors and strict:
        raise StepValidationError(step_name, errors, "output")
    return errors


def seed_url(data: dict[str, Any]) -> str:
    """CrawlStepInput.seed_url: the string, or the list's first element."""
    v = data["url"]
    return v if isinstance(v, str) else v[0]


def url_list(data: dict[str, Any]) -> list[str]:
    """ScrapeStepInput.url_list: always a list."""
    v = data["urls"]
    return [v] if isinstance(v, str) else list(v)


def validate_required_fields(
    step_name: str,
    step_type: str,
    extracted_data: dict[str, Any],
    required_fields: list[str] | None = None,
) -> list[str]:
    """-> missing required fields (defaults are flexible: none required)."""
    required = required_fields or []
    return [f for f in required if f not in extracted_data]
