"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship parse->enrich->aggregate pipeline on sf0.001.
``queries()`` maps each implemented SURVEY §2 operator/pipeline to a callable
taking ``sf_dir``; ``oracle_sql()`` gives the DuckDB-equivalent SQL (over the
pre-registered views; transcript queries prepend the canonical synthesis CTE
from ``security_log_analysis_rust_ray.synth`` so engine and oracle see the
same derived input).  Ray is initialised by the caller — nothing here calls
``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from security_log_analysis_rust_ray.synth import oracle_query
from security_log_analysis_rust_ray.pipelines import reports as R


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return R.country_counts("/root/testdata/sf0.001")


# SQL fragment: the deterministic miss-resolver (mirror of
# security_log_analysis_rust_ray.stages.enrich.resolve_host).
_RESOLVE_K = (
    "CAST(CASE WHEN p.host LIKE 'h%.example.com' "
    "THEN regexp_extract(p.host, '^h(\\d+)\\.example\\.com', 1) "
    "ELSE split_part(p.host, '.', 2) END AS INT)"
)
_RESOLVE_CODE = (
    f"chr(65 + CAST({_RESOLVE_K} % 26 AS INT)) || "
    f"chr(65 + CAST(({_RESOLVE_K} * 7) % 26 AS INT))"
)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "transcripts": R.transcripts,
        "parsed": R.parsed,
        "messages": R.messages,
        "route_counts": R.route_counts,
        "parsed_dedup": R.parsed_dedup,
        "enriched": R.enriched,
        "enriched_resolved": R.enriched_resolved,
        "dim_updates": R.dim_updates,
        "dangling_hosts": R.dangling_hosts,
        "country_counts": R.country_counts,
        "top10_countries": R.top10_countries,
        "agg_conv_role_tool": R.agg_conv_role_tool,
        "watermarks": R.watermarks,
        "incremental_parsed": R.incremental_parsed,
        "year_month_hist": R.year_month_hist,
        "oldest_unprocessed": R.oldest_unprocessed,
        "recent_parsed_page": R.recent_parsed_page,
    }


def oracle_sql() -> dict[str, str]:
    q = {
        "transcripts": "SELECT * FROM transcripts",
        "parsed": "SELECT * FROM parsed",
        "messages": "SELECT * FROM messages",
        "route_counts":
            "SELECT service, count(*) AS cnt FROM parsed GROUP BY service",
        "parsed_dedup":
            "SELECT * FROM parsed QUALIFY row_number() OVER ("
            "PARTITION BY service, server, datetime, host, username "
            "ORDER BY ts, conv_id, turn_idx) = 1",
        "enriched":
            "SELECT p.*, hc.code AS code, cc.country AS country "
            "FROM parsed p "
            "LEFT JOIN host_country hc ON p.host = hc.host "
            "LEFT JOIN country_code cc ON hc.code = cc.code",
        "enriched_resolved":
            "SELECT p.*, "
            f"COALESCE(hc.code, {_RESOLVE_CODE}) AS code, "
            f"'Country ' || COALESCE(hc.code, {_RESOLVE_CODE}) AS country, "
            "CASE WHEN hc.code IS NOT NULL THEN 'dim' ELSE 'resolved' END "
            "AS enrich_source "
            "FROM parsed p LEFT JOIN host_country hc ON p.host = hc.host",
        "dim_updates":
            f"SELECT DISTINCT p.host AS host, {_RESOLVE_CODE} AS code "
            "FROM parsed p LEFT JOIN host_country hc ON p.host = hc.host "
            "WHERE hc.host IS NULL",
        "dangling_hosts":
            "SELECT DISTINCT p.host AS host FROM parsed p "
            "LEFT JOIN host_country hc ON p.host = hc.host "
            "WHERE hc.host IS NULL",
        "country_counts":
            "SELECT cc.country AS country, count(*) AS cnt FROM parsed p "
            "JOIN host_country hc ON p.host = hc.host "
            "JOIN country_code cc ON hc.code = cc.code "
            "GROUP BY cc.country",
        "top10_countries":
            "SELECT cc.country AS country, count(*) AS cnt FROM parsed p "
            "JOIN host_country hc ON p.host = hc.host "
            "JOIN country_code cc ON hc.code = cc.code "
            "GROUP BY cc.country ORDER BY cnt DESC, country LIMIT 10",
        "agg_conv_role_tool":
            "SELECT conv_id, role, tool, count(*) AS cnt FROM transcripts "
            "GROUP BY conv_id, role, tool",
        "watermarks":
            "SELECT service, server, max(datetime) AS watermark FROM parsed "
            "GROUP BY service, server",
        "incremental_parsed":
            "SELECT * FROM parsed "
            f"WHERE datetime > TIMESTAMP '{R.INCREMENTAL_CUTOFF}'",
        "year_month_hist":
            "SELECT CAST(year(datetime) AS INT) AS year, "
            "CAST(month(datetime) AS INT) AS month, count(*) AS cnt "
            "FROM parsed GROUP BY 1, 2",
        "oldest_unprocessed":
            "SELECT * FROM messages "
            "ORDER BY log_timestamp, conv_id, turn_idx LIMIT 1",
        "recent_parsed_page":
            "SELECT * FROM parsed "
            "ORDER BY datetime DESC, conv_id, turn_idx LIMIT 20",
    }
    return {name: oracle_query(body) for name, body in q.items()}
