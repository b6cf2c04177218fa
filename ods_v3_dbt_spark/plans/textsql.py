"""Shared DuckDB-SQL fragments mirroring ``functions/text.py``.

Lives in its own import-cycle-free module so every declared-query
module (llm_queries, analytics_queries) can build oracle SQL from the
same fragments without importing each other at module-init time.
"""

#: Whitespace token count with the empty-string guard — mirrors
#: functions/text.py token_count exactly.
NTOK = (
    "CASE WHEN length(lower(trim({c}))) = 0 THEN 0 "
    "ELSE len(string_split_regex(lower(trim({c})), '\\s+')) END"
)

#: Length/punct/digit quality score in milli-units — mirrors
#: functions/text.py quality_score_milli exactly.
QUALITY_MILLI_SQL = f"""greatest(
             1000
             - (CASE WHEN {NTOK.format(c='text')} < 10 THEN (10 - {NTOK.format(c='text')}) * 50 ELSE 0 END)
             - least(len(regexp_extract_all(text, '[^\\w\\s]')) * 20, 400)
             - least(len(regexp_extract_all(text, '[0-9]')) * 10, 200)
             - (CASE WHEN length(text) = 0 THEN 1000 ELSE 0 END),
             0)"""
