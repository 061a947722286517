"""Domain pipeline: the reference's four ETL stages re-expressed as pure
``DataFrame → DataFrame`` functions over one lazy Catalyst plan.

- ``ingest``  — dw2: nested order JSON → normalized line items
- ``merge``   — dw3: incremental delete-insert merge + title staging
- ``dims``    — dw4: Book/Bundle/Merch dimensions via similarity matching
- ``facts``   — dw5: FACT_Royalty, FACT_Order, reports, split royalties

The reference runs these as four subprocesses with CSV-on-GCS handoffs
(``main_orchestrator.py:37-49``); here each stage is a function and the
"IR" is a DataFrame — one optimized plan per sink, Parquet/Delta staging
only where restartability is wanted (SURVEY.md §3.1).
"""
