"""Source resolvers: TPC-H-ish driver testdata + synthetic furchild bronze
fixtures (FIXTURES.md schemas)."""

from .fixtures import bronze_fixtures, write_fixture_parquet  # noqa: F401
