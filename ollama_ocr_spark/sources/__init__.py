"""Sources/sinks: driver testdata loader and the icetbl snapshot-table layer."""
