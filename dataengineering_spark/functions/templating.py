"""SQL templating compat (SURVEY.md §2.8 F9, §2.11 X2).

The reference renders SQL three ways: jinja ``{{ var }}``
(``clickhouse/v1/utils.py:246-251``), a bespoke ``[[ key ]]``
substitution (``airflow/bigquery/utils.py:43-53``), and env-var
substitution on blobs (``clickhouse/v1/operator.py:442-447``). All
string interpolation — SQL-injection-prone and opaque to any cache.

The engine's native path is parameter markers
(``spark.sql(query, args=...)`` — see sources/io.run_sql_file). The
renderers below exist for migrating existing template corpora: same
syntax, pure Python, no jinja dependency.
"""

from __future__ import annotations

import os
import re


def render_sql(template: str, params: dict) -> str:
    """``{{ var }}`` substitution (jinja-compatible for the plain-
    variable subset the reference actually uses). Unknown variables
    raise — silently leaving ``{{ x }}`` in SQL is the reference's
    failure mode we remove."""

    def sub(m: re.Match) -> str:
        key = m.group(1).strip()
        if key not in params:
            raise KeyError(f"template variable {{{{ {key} }}}} not provided")
        return str(params[key])

    return re.sub(r"\{\{([^}]+)\}\}", sub, template)


def format_sql_query(template: str, params: dict) -> str:
    """``[[ key ]]`` substitution (reference
    ``airflow/bigquery/utils.py:43-53``)."""

    def sub(m: re.Match) -> str:
        key = m.group(1).strip()
        if key not in params:
            raise KeyError(f"template variable [[ {key} ]] not provided")
        return str(params[key])

    return re.sub(r"\[\[([^\]]+)\]\]", sub, template)


def apply_env_variables(blob: str, environ: dict | None = None) -> str:
    """``$VAR``/``${VAR}`` env substitution on a SQL blob (reference
    ``apply_env_variables_on_blob``); missing vars are left intact,
    matching the reference's os.path.expandvars behavior."""
    env = environ if environ is not None else dict(os.environ)

    def sub(m: re.Match) -> str:
        key = m.group(1) or m.group(2)
        return str(env.get(key, m.group(0)))

    return re.sub(r"\$\{(\w+)\}|\$(\w+)", sub, blob)
