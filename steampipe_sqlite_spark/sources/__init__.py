"""Half A of the engine: the connector bridge (SURVEY.md §0).

The reference is a SQLite virtual-table bridge over live plugin data; this
package is the same bridge re-expressed on Spark's Python Data Source API:

- connector.py  — connector protocol (schema/key-columns/quals/limit/config),
                  the analog of the steampipe-plugin-sdk proto surface.
- datasource.py — generic PySpark DataSource turning any connector table
                  into a Spark table with filter pushdown + Arrow reads.
- cache.py      — TTL result cache (reference cache.go / register.go:15-19).
- chaos.py      — deterministic test connector (analog of the chaos plugin
                  the reference CI builds, .github/workflows/test.yml:38-44).
"""
