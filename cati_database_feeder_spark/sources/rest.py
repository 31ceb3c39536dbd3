"""REST API sources (SURVEY.md §2.1 ops #4-#6).

Reference behavior: sequential page loop with a 12 s sleep
(feeder.py:22-34), a single-collection GET (feeder.py:40-43), and a
create→poll→download async-export job (feeder.py:49-118).

Engine shape:
- small collections (projects, counters) are fetched on the driver and
  become broadcastable DataFrames — they're dimension metadata;
- large paginated collections fan out: ``spark.range(n_pages)`` →
  ``mapInPandas(fetch_page)`` so every executor pulls its own pages in
  parallel (rate limits permitting — ``page_delay_s`` throttles);
- the async export job stays a *driver-side utility* (it is
  orchestration, not dataflow — SURVEY.md §4.3): poll until done, put
  the file on shared storage, then the engine scans it.

HTTP is injectable (``fetch``) so tests run hermetic with a fake; the
default uses urllib (stdlib — `requests` is not assumed on executors).
"""

from __future__ import annotations

import json
import time
import urllib.request
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

PAGE_SCHEMA = "page long, body string"


def _default_fetch(url: str) -> str:
    with urllib.request.urlopen(url, timeout=30) as resp:  # noqa: S310
        return resp.read().decode("utf-8")


def fetch_collection(spark: SparkSession, url: str,
                     fetch: Callable[[str], str] = _default_fetch) -> DataFrame:
    """Op #5: single-collection GET → DataFrame (driver-side; the result
    is dimension-sized by construction)."""
    body = json.loads(fetch(url))
    rows = body["body"] if isinstance(body, dict) and "body" in body else body
    return spark.createDataFrame(pd.DataFrame(rows))


def fetch_paginated(spark: SparkSession, base_url: str, n_pages: int,
                    page_size: int = 100,
                    fetch: Callable[[str], str] = _default_fetch,
                    page_delay_s: float = 0.0) -> DataFrame:
    """Op #4 parallelized: one task per page via mapInPandas over
    ``spark.range`` — the reference's 12 s-per-page loop becomes
    n_pages/parallelism wall-clock. ``page_delay_s`` recreates the
    rate-limit pause *per executor* when the API demands it."""

    def fetch_pages(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bodies = []
            for page in pdf["id"]:
                if page_delay_s:
                    time.sleep(page_delay_s)
                url = f"{base_url}?PageSize={page_size}&PageNumber={int(page) + 1}"
                bodies.append(fetch(url))
            yield pd.DataFrame({"page": pdf["id"].astype("int64"), "body": bodies})

    return spark.range(n_pages).mapInPandas(fetch_pages, schema=PAGE_SCHEMA)


# The reference's async-export options payload (feeder.py:52-84),
# preserved verbatim as a source config: every flag its API accepts for
# a results-data export, with the reference's defaults. ``counterId``
# is per-call and injected by export_request_payload.
EXPORT_OPTIONS: dict = {
    "exportFormat": 2,
    "spssEncoding": 0,
    "dateFrom": None,
    "dateTo": None,
    "includeAll": False,
    "addNumericPublicId": False,
    "allowFullSizeStrings": False,
    "exportQuestionText": False,
    "exportLabelsInsteadValues": False,
    "exportLabelsAndCodeValues": True,
    "ignoreErrors": True,
    "exportHostAddress": False,
    "exportUserAgent": False,
    "exportInterviewDumpUrl": False,
    "exportInterviewResult": True,
    "exportContactData": True,
    "exportValidationComments": False,
    "exportValidationDetails": False,
    "includeTotalDurations": False,
    "exportEndedCreatedDifference": False,
    "exportContractorInfo": False,
    "convertMultiLineTextToSingleLine": False,
    "exportSpoofingDataFields": False,
    "exportMobileAppId": False,
    "exportDurationInMinutes": False,
    "exportQuestionsDuration": False,
    "exportUpdatedAt": False,
    "archiveSingleXlsxResultFile": True,
    "easyTabsIntegration": False,
}


def export_request_payload(counter_id: int,
                           options: dict | None = None) -> str:
    """JSON body for the create-export POST (feeder.py:49-87):
    EXPORT_OPTIONS (or an override dict) plus the per-call counterId.
    Callers POST this via their injected ``create`` callable and hand
    the returned request id to ``poll_export_job``."""
    body = {"counterId": counter_id, **(EXPORT_OPTIONS if options is None else options)}
    return json.dumps(body)


def poll_export_job(create: Callable[[], int],
                    get_status: Callable[[int], dict],
                    download: Callable[[str], str],
                    poll_interval_s: float = 10.0,
                    timeout_s: float = 3600.0,
                    on_log: Callable[[str], None] | None = None) -> str:
    """Op #6: create→poll→download as a driver utility (the reference's
    while-sleep at feeder.py:103-116, with a timeout the reference
    lacks). Returns the downloaded file's local/remote path; callers
    then ``spark.read`` it. state == 3 means ready (feeder.py:113).

    ``on_log`` receives the newest non-empty server-log line on each
    poll — the reference prints the log tail while waiting
    (feeder.py:107-111: split, drop empties, print last)."""
    request_id = create()
    deadline = time.monotonic() + timeout_s
    while True:
        status = get_status(request_id)
        if on_log and status.get("log"):
            lines = [ln for ln in status["log"].split("\n") if ln]
            if lines:
                on_log(lines[-1])
        if status.get("state") == 3:
            return download(status["fileUrl"])
        if time.monotonic() > deadline:
            raise TimeoutError(f"export job {request_id} not ready after {timeout_s}s")
        time.sleep(poll_interval_s)
