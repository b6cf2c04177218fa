"""Declarative table catalog — the engine's schema API.

The reference declares every table externally as ``pipeline_params/
*.json``: a ``column → pandas dtype`` map plus extraction metadata
(``des_schema_name``, ``des_table_name``, ``cursor_field``, per-table
merge script). That JSON contract is the reference's public schema
surface (``plugins/operators/bccp_to_ods.py:240`` enforces it with
``astype``), so the engine keeps it: a :class:`TableSpec` carries the
same fields, derives a Spark ``StructType``, and additionally pins
what the reference leaves implicit in its SQL scripts — merge keys,
strategy, tie semantics, partition columns.

Scale note: partitioning is part of the spec because the M6/M7
delete+insert strategies only stay cheap at 100 TB when the delete key
is the physical partition key (dynamic partition overwrite rewrites
touched days only — SURVEY §4).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import types as St

#: Reference pandas dtype → Spark type (SURVEY §1.2 mapping table).
REFERENCE_DTYPES: dict[str, St.DataType] = {
    "string": St.StringType(),
    "str": St.StringType(),
    "object": St.StringType(),
    "Int64": St.LongType(),
    "int64": St.LongType(),
    "int": St.IntegerType(),
    "float64": St.DoubleType(),
    "float": St.DoubleType(),
    "bool": St.BooleanType(),
    "boolean": St.BooleanType(),
    "datetime64[ns]": St.TimestampType(),
    "datetime": St.TimestampType(),
    # Spark-native names pass through for specs written against us.
    "long": St.LongType(),
    "bigint": St.LongType(),
    "double": St.DoubleType(),
    "timestamp": St.TimestampType(),
    "date": St.DateType(),
    "binary": St.BinaryType(),
}

#: Load strategies — names match SURVEY §2.3.
STRATEGIES = {
    "merge_upsert",            # M1/M2
    "merge_upsert_fresh",      # M3 (tie_update in spec)
    "dedup_then_merge",        # M4
    "merge_nullsafe",          # M5
    "delete_insert_window",    # M6
    "partition_overwrite",     # M7
    "full_refresh",            # M8
    "refresh_dedup",           # M9
    "append",                  # run-log style
}


def to_spark_type(dtype: str) -> St.DataType:
    if dtype.startswith("array<"):
        return St.ArrayType(to_spark_type(dtype[6:-1]))
    try:
        return REFERENCE_DTYPES[dtype]
    except KeyError:
        raise ValueError(f"unknown declared dtype {dtype!r}") from None


@dataclass(frozen=True)
class TableSpec:
    """One table's declared contract (reference: one entry in
    ``pipeline_params/{source}.json`` + its update_des_table script)."""

    name: str
    schema_name: str                      # layer: staging / ods_* / datamart / export
    columns: dict[str, str]               # column → declared dtype (ordered)
    keys: tuple[str, ...] = ()
    cursor_field: str | None = None
    cursor_kind: str = "timestamp"        # "timestamp" | "int_yyyymmdd" (S3)
    strategy: str = "full_refresh"
    tie_update: bool = False              # M3: True = src wins ties (>=)
    dedup_order: tuple[str, ...] = ()     # M4/M9: "col asc" / "col desc"
    partition_cols: tuple[str, ...] = ()
    src_columns: dict[str, str] = field(default_factory=dict)  # S7 rename map

    def __post_init__(self) -> None:
        if self.strategy not in STRATEGIES:
            raise ValueError(f"{self.name}: unknown strategy {self.strategy!r}")
        for k in self.keys:
            if k not in self.columns:
                raise ValueError(f"{self.name}: key {k!r} not in columns")
        if self.cursor_field and self.cursor_field not in self.columns:
            raise ValueError(f"{self.name}: cursor {self.cursor_field!r} not in columns")

    @property
    def qualified_name(self) -> str:
        return f"{self.schema_name}.{self.name}"

    def struct_type(self) -> St.StructType:
        return St.StructType(
            [St.StructField(c, to_spark_type(t), nullable=True) for c, t in self.columns.items()]
        )

    def cursor_is_int_day(self) -> bool:
        """S3: declared int cursor means yyyymmdd day-id windows
        (``casreport_to_ods.py:252-301``)."""
        return self.cursor_kind == "int_yyyymmdd" or (
            self.cursor_field is not None and self.columns[self.cursor_field] == "int"
        )


class Catalog:
    """A named set of :class:`TableSpec` (one reference ``pipeline_params``
    file ≈ one source system's catalog)."""

    def __init__(self, specs: dict[str, TableSpec] | None = None) -> None:
        self._specs: dict[str, TableSpec] = dict(specs or {})

    def add(self, spec: TableSpec) -> TableSpec:
        self._specs[spec.name] = spec
        return spec

    def get(self, name: str) -> TableSpec:
        return self._specs[name]

    def __iter__(self):
        return iter(self._specs.values())

    def __len__(self) -> int:
        return len(self._specs)

    @classmethod
    def from_params_json(cls, path: str | Path) -> "Catalog":
        """Load a reference-shaped params file: ``{table: {des_schema_name,
        des_table_name, columns: {...}, cursor_field?, key?, strategy?,
        ...}}`` (shape of ``pipeline_params/bccp.json``)."""
        raw = json.loads(Path(path).read_text())
        cat = cls()
        for logical, cfg in raw.items():
            cat.add(
                TableSpec(
                    name=cfg.get("des_table_name", logical),
                    schema_name=cfg.get("des_schema_name", "staging"),
                    columns=dict(cfg["columns"]),
                    keys=tuple(cfg.get("key", []) if isinstance(cfg.get("key"), list) else filter(None, [cfg.get("key")])),
                    cursor_field=cfg.get("cursor_field"),
                    cursor_kind=cfg.get("cursor_kind", "timestamp"),
                    strategy=cfg.get("strategy", "full_refresh"),
                    tie_update=bool(cfg.get("tie_update", False)),
                    dedup_order=tuple(cfg.get("dedup_order", [])),
                    partition_cols=tuple(cfg.get("partition_cols", [])),
                    src_columns=dict(cfg.get("src_columns", {})),
                )
            )
        return cat


def fixture_catalog() -> Catalog:
    """The FIXTURES.md tables as a built-in catalog — every merge
    strategy, cursor kind, and tie semantic the reference exercises
    (sources cited per fixture in FIXTURES.md)."""
    cat = Catalog()
    cat.add(TableSpec(
        name="bccp_item", schema_name="ods_bccp",
        columns={
            "item_code": "string", "acceptance_pos_code": "string",
            "sender_fullname": "string", "is_domestic": "bool",
            "weight": "float64", "total_freight": "float64", "status": "string",
            "sending_time": "datetime64[ns]", "create_time": "datetime64[ns]",
            "last_updated_time": "datetime64[ns]",
        },
        keys=("item_code",), cursor_field="last_updated_time",
        strategy="merge_upsert_fresh", tie_update=False,  # bccp_item.sql:175 "<"
    ))
    cat.add(TableSpec(
        name="hrm_employee", schema_name="ods_hrm",
        columns={
            "employee_code": "string", "employee_name": "string", "unit_code": "string",
            "updated_date": "datetime64[ns]", "action_status": "string",
            "employee_status": "string", "start_date": "datetime64[ns]",
            "end_date": "datetime64[ns]",
        },
        keys=("employee_code",), cursor_field="updated_date",
        strategy="dedup_then_merge",
        dedup_order=("updated_date asc", "action_status desc"),  # hrm_employee.sql:23
    ))
    cat.add(TableSpec(
        name="item_delivery_detail", schema_name="ods_pns",
        columns={
            "lading_code": "string", "pos_code": "string", "postman_code": "string",
            "status_code": "string", "weight": "float64", "quantity": "Int64",
            "so_tien_thu_ho": "Int64", "status_date": "int",
            "lat": "string", "lon": "string", "etl_date": "datetime64[ns]",
        },
        cursor_field="status_date", cursor_kind="int_yyyymmdd",
        strategy="partition_overwrite", partition_cols=("status_date",),
    ))
    cat.add(TableSpec(
        name="f_item_s98", schema_name="ods_casreport",
        columns={
            "tran_id": "string", "tran_id_org": "string", "row_item_code": "string",
            "tran_date_id": "int", "created_by": "string", "post_code": "string",
            "contractid": "string", "customerid": "string", "tran_code": "string",
            "ma_spdv": "string", "ma_doanh_thu": "string", "ma_doanhthu_ps": "string",
            "ma_loaigd": "string", "tinhchat_gd": "string",
            "s98_cit_15": "float64", "s98_cit_17": "float64", "s98_cit_18": "float64",
            "s98_cit_20": "float64", "s98_cit_21": "float64", "weight": "float64",
        },
        keys=("tran_id", "tran_id_org", "row_item_code"),
        cursor_field="tran_date_id", cursor_kind="int_yyyymmdd",
        strategy="merge_upsert",  # casreport_f_item_s98.sql:3
    ))
    cat.add(TableSpec(
        name="d_row_item", schema_name="ods_casreport",
        columns={
            "row_item_code": "string", "row_item_name": "string",
            "nhom_nghiep_vu": "string", "factor": "float64", "status": "string",
        },
        keys=("row_item_code",), strategy="merge_upsert",
    ))
    cat.add(TableSpec(
        name="customers", schema_name="ods_cms",
        columns={
            "accnt_id": "Int64", "accnt_code": "string", "accnt_name": "string",
            "accnt_gender": "Int64", "accnt_dob": "datetime64[ns]",
            "created_date": "datetime64[ns]", "accnt_status": "Int64",
            "accnt_email": "string", "lon": "string", "lat": "string",
        },
        keys=("accnt_id",), cursor_field="created_date",
        strategy="full_refresh",  # cms/customers.sql:1-2
    ))
    cat.add(TableSpec(
        name="khl_portal_billing_result", schema_name="ods_portalkhl",
        columns={
            "id": "string", "shbg": "string", "service_code": "string",
            "fee_public": "float64", "tax_public": "float64",
            "fee_special": "float64", "tax_special": "float64",
            "taxrate_public": "float64", "updated": "datetime64[ns]",
        },
        keys=("id",), cursor_field="updated",
        strategy="merge_upsert_fresh", tie_update=True,  # khl...sql:3-4 ">="
    ))
    cat.add(TableSpec(
        name="settlements", schema_name="ods_casreport",
        columns={
            "groupid": "string", "nodeid": "string", "num": "Int64",
            "txnid": "string", "txntype": "Int64", "account": "string",
            "amount": "float64", "poscode": "string",
            "createddate": "datetime64[ns]", "created_date_id": "int",
            "update_date": "datetime64[ns]",
        },
        keys=("groupid", "nodeid", "num"), cursor_field="update_date",
        strategy="merge_upsert",  # casreport_settlements.sql:3
    ))
    cat.add(TableSpec(
        name="rpt_full_item", schema_name="ods_casreport",
        columns={
            "hdr_id": "string", "dtl_id": "string",
            "trans_date": "datetime64[ns]", "trans_type": "string",
            "service_code": "string", "weight": "float64",
            "total_fee_public": "float64", "cod_amount": "float64",
            "customer_code": "string", "pocode_rec": "string",
        },
        cursor_field="trans_date",
        strategy="delete_insert_window",  # casreport_rpt_full_item.sql:1-7
    ))
    cat.add(TableSpec(
        name="collection_delivery_route", schema_name="ods_pns",
        columns={
            "route_code": "string", "unit_code": "string", "route_name": "string",
            "unit_id": "string", "unit_name": "string", "status": "string",
            "route_kind_code": "string", "route_type_code": "string",
            "_row_idx": "Int64",
        },
        keys=("route_code", "unit_code"),
        strategy="dedup_then_merge", dedup_order=("_row_idx asc",),  # A7 keep-first
    ))
    cat.add(TableSpec(
        name="hrm_unit", schema_name="ods_hrm",
        columns={
            "unit_id": "string", "parent_id": "string", "level_id": "Int64",
            "unit_code": "string", "unit_name": "string", "province_code": "string",
            "created_date": "datetime64[ns]", "updated_date": "datetime64[ns]",
            "status": "string",
        },
        keys=("unit_id",), strategy="merge_upsert",
        src_columns={  # S7: REST payload camelCase → des (hrm_to_ods.py:132-157)
            "unitId": "unit_id", "parentId": "parent_id", "levelId": "level_id",
            "unitCode": "unit_code", "unitName": "unit_name",
            "provinceCode": "province_code", "createdDate": "created_date",
            "updatedDate": "updated_date", "status": "status",
        },
    ))
    cat.add(TableSpec(
        name="revenue_by_employee", schema_name="export_llb",
        columns={
            "tran_date_id": "int", "created_by": "string", "post_code": "string",
            "contractid": "string", "customerid": "string", "tran_code": "string",
            "ma_spdv": "string", "ma_doanh_thu": "string",
            "nhom_nghiep_vu": "string", "row_item_code": "string",
            "revenue": "float64", "sales": "float64",
        },
        keys=("tran_date_id", "created_by", "post_code", "contractid",
              "customerid", "tran_code", "ma_spdv", "ma_doanh_thu",
              "nhom_nghiep_vu", "row_item_code"),
        strategy="merge_nullsafe",  # staging_revenue_by_employee.sql:3-12
    ))
    return cat
