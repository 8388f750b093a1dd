"""Sources & sinks: ledger Parquet scan and single-file Parquet sink."""
