"""Per-entity conform + merge specifications — the reference's 13
per-collection transform modules re-expressed as declarative specs
(SURVEY.md §2.2–§2.6, FIXTURES.md).

Each EntitySpec carries: the input StructType, an optional pre-transform
(filter/explode — only loanapplications uses one, ref
loanapplication_table.py:26-49), the flatten projection (output column →
Column expression), and the merge policy (conflict key + mutable columns,
ref §2.6 M1–M13). ``conform()`` turns a nested DataFrame into its flat
warehouse shape in ONE select.

The reference's two known bugs are NOT reproduced (SURVEY.md §2.2): we
project ``type`` from the real ``type`` field (not businessName,
ref organizations_table.py:65) and take referrers[0] (not the first char of
its string repr, ref agribusiness_table.py:63).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from airflow_pipelines_from_mongo_to_postgres_spark import schemas
from airflow_pipelines_from_mongo_to_postgres_spark.functions import conform as C


@dataclass(frozen=True)
class EntitySpec:
    name: str
    schema: StructType
    flatten: Callable[[], dict[str, Column]]
    merge_key: str = "_id"
    mutable: tuple[str, ...] = ()
    insert_only: bool = False  # ON CONFLICT DO NOTHING (M11–M13)
    pre: Callable[[DataFrame], DataFrame] | None = None
    parents: tuple[str, ...] = ()  # load-order deps (J3 FKs)

    def conform(self, df: DataFrame) -> DataFrame:
        if self.pre is not None:
            df = self.pre(df)
        return C.flatten(df, self.flatten())


def _users_flatten() -> dict[str, Column]:
    # ref user_table.py:58-87
    return {
        "_id": F.col("_id"),
        "username": F.col("username"),
        "first_name": C.nested("personalInformation.firstName"),
        "last_name": C.nested("personalInformation.lastName"),
        "email": C.nested("personalInformation.email"),
        "phone_number": C.nested("personalInformation.phoneNumber"),
        "company_name": C.nested("companyInformation.companyName"),
        "roles": C.stringify("roles"),
        "deleted": C.bool_default("deleted"),
        "blocked": C.bool_default("blocked"),
        "has_password": C.bool_default("hasPassword"),
        "logged_in": C.bool_default("loggedIn"),
        "account_reviewed": C.bool_default("accountReviewed"),
        "validation_email": C.bool_default("validations.email"),
        "validation_phone_number": C.bool_default("validations.phoneNumber"),
        "date_created": C.date_sentinel("dateCreated"),
        "last_login": C.date_sentinel("lastLogin"),
    }


def _organizations_flatten() -> dict[str, Column]:
    # ref organizations_table.py:58-89 (intended semantics for `type`)
    out = {
        "_id": F.col("_id"),
        "business_name": F.col("businessName"),
        "registration_number": F.col("registrationNumber"),
        "type": F.col("type"),
        "value_chain": F.col("valueChain"),
        "created_by": F.col("createdBy"),
        "org_user": F.col("orgUser"),
        "owner": F.col("owner"),
        "deleted": C.bool_default("deleted"),
        "date_created": C.date_sentinel("dateCreated"),
    }
    for cam, snake in [
        ("businessOperations", "business_operations"),
        ("businessLine", "business_line"),
        ("businessType", "business_type"),
        ("businessDateCreated", "business_date_created"),
        ("businessOwner", "business_owner"),
        ("employeesAmount", "employees_amount"),
        ("avenewsReason", "avenews_reason"),
    ]:
        out[snake] = C.nested(f"onboardingInformation.{cam}")
    return out


def _trades_flatten() -> dict[str, Column]:
    # ref trades_table.py:58-92 — element 0 of products (P3)
    return {
        "_id": F.col("_id"),
        "type": F.col("type"),
        "name": F.col("name"),
        "product_id": C.first_element("products", "productId"),
        "product_name": C.first_element("products", "name"),
        "package_size": C.first_element("products", "packageSize"),
        "measurement_unit": C.first_element("products", "measurementUnit"),
        "unit_price": C.first_element("products", "unitPrice"),
        "quantity": C.first_element("products", "quantity"),
        "total_price": F.col("totalPrice"),
        "number": F.col("number"),
        "organization": F.col("organization"),
        "created_by": F.col("createdBy"),
        "notes": F.col("notes"),
        "status": F.col("status"),
        "deleted": C.bool_default("deleted"),
        "date": C.date_sentinel("date"),
        "due_date": C.date_sentinel("dueDate"),
        "date_created": C.date_sentinel("dateCreated"),
    }


def _agribusinesses_flatten() -> dict[str, Column]:
    # ref agribusiness_table.py:58-87 — contacts[0] with explicit defaults
    return {
        "_id": F.col("_id"),
        "organization": F.col("organization"),
        "business_details_name": C.nested("businessDetails.name"),
        "business_details_phone": C.nested("businessDetails.phoneNumber"),
        "referrer": F.try_element_at(F.col("referrers"), F.lit(1)),
        "contact_id": C.first_element("contacts", "_id"),
        "contact_first_name": C.first_element("contacts", "firstName"),
        "contact_last_name": C.first_element("contacts", "lastName"),
        "contact_deleted": F.coalesce(
            F.try_element_at(F.col("contacts"), F.lit(1)).getField("deleted"),
            F.lit(False)),
        "contact_date_created": F.coalesce(
            F.try_element_at(F.col("contacts"), F.lit(1)).getField("dateCreated"),
            F.lit(C.SENTINEL_DATE).cast("timestamp")),
        "created_by": F.col("createdBy"),
        "deleted": C.bool_default("deleted"),
        "date_created": C.date_sentinel("dateCreated"),
    }


def _invoices_flatten() -> dict[str, Column]:
    # ref invoices_table.py:67-109
    return {
        "_id": F.col("_id"),
        "organization": F.col("organization"),
        "name": F.col("name"),
        "phone_number": F.col("phoneNumber"),
        "email": F.col("email"),
        "payment_terms": F.col("paymentTerms"),
        "payment_method": F.col("paymentMethod"),
        "terms_and_conditions": F.col("termsAndConditions"),
        "tax": F.col("taxPercentaje"),
        "created_by": F.col("createdBy"),
        "product_id": C.first_element("products", "productId"),
        "product_name": C.first_element("products", "name"),
        "package_size": C.first_element("products", "packageSize"),
        "measurement_unit": C.first_element("products", "measurementUnit"),
        "unit_price": C.first_element("products", "unitPrice"),
        "quantity": C.first_element("products", "quantity"),
        "deleted": C.bool_default("deleted"),
        "status": F.col("status"),
        "issue_date": C.date_sentinel("issueDate"),
        "supply_date": C.date_sentinel("supplyDate"),
        "due_date": C.date_sentinel("dueDate"),
        "date_created": C.date_sentinel("dateCreated"),
    }


def _cashflow_events_flatten() -> dict[str, Column]:
    # ref cashflow_events_table.py:54-75 — products kept whole, stringified (P6)
    return {
        "_id": F.col("_id"),
        "organization": F.col("organization"),
        "amount": F.col("amount"),
        "type": F.col("type"),
        "created_by": F.col("createdBy"),
        "products": C.stringify("products"),
        "deleted": C.bool_default("deleted"),
        "status": F.col("status"),
        "date": C.date_sentinel("date"),
        "date_created": C.date_sentinel("dateCreated"),
    }


def _cashflow_event_goals_flatten() -> dict[str, Column]:
    # ref cashflow_events_goals_table.py:54-74
    return {
        "_id": F.col("_id"),
        "organization": F.col("organization"),
        "total_amount": F.col("totalAmount"),
        "month_amount": F.col("monthAmount"),
        "goal": F.col("goal"),
        "way": F.col("way"),
        "notify": F.col("notify"),
        "created_by": F.col("createdBy"),
        "deleted": C.bool_default("deleted"),
        "status": F.col("status"),
        "date": C.date_sentinel("date"),
        "date_created": C.date_sentinel("dateCreated"),
    }


def _accounts_flatten() -> dict[str, Column]:
    # ref accounts_table.py:50-68 — details stringified (P6)
    return {
        "_id": F.col("_id"),
        "beneficiary_id": F.col("beneficiaryId"),
        "details": C.stringify("details"),
        "service": F.col("service"),
        "created_by": F.col("createdBy"),
        "on_model": F.col("onModel"),
        "deleted": C.bool_default("deleted"),
        "validated": C.bool_default("validated"),
        "date_created": C.date_sentinel("dateCreated"),
    }


def _loanapplications_pre(df: DataFrame) -> DataFrame:
    # ref loanapplication_table.py:26-35 — $match(dateCreated > 2022-10-05)
    # then $unwind($products): the only server-side filter+explode pipeline.
    # IDEMPOTENT: when the source already ran the reference pipeline
    # (mongoql.apply_pipeline or the live connector's server-side
    # aggregation.pipeline), products is already the exploded scalar and
    # the date bound already applied — both steps are no-ops then, so one
    # EntitySpec serves raw and pipeline-fed sources.
    from pyspark.sql.types import ArrayType

    df = df.filter(F.col("dateCreated") > F.lit("2022-10-05 00:00:00").cast("timestamp"))
    if isinstance(df.schema["products"].dataType, ArrayType):
        df = C.explode_unwind(df, "products")
    return df


def _loanapplications_flatten() -> dict[str, Column]:
    # ref loanapplication_table.py:54-69 — loan modules keep camelCase (P5 note)
    return {
        "_id": F.col("_id"),
        "email": C.nested("personalDetails.email"),
        "phoneNumber": C.nested("personalDetails.primaryPhoneNumber"),
        "businessName": C.nested("businessDetails.name"),
        "deleted": C.bool_default("deleted"),
        "dateCreated": C.date_sentinel("dateCreated"),
        "assignee": F.col("assignee"),
        "status": F.col("status"),
        "products": F.col("products"),  # post-explode scalar
        "dealId": F.col("dealId"),
    }


def _identity_flatten(*cols: str) -> Callable[[], dict[str, Column]]:
    return lambda: {c: F.col(c) for c in cols}


ENTITIES: dict[str, EntitySpec] = {
    "users": EntitySpec(
        "users", schemas.USERS, _users_flatten,
        mutable=("roles", "deleted", "blocked", "has_password", "logged_in",
                 "account_reviewed", "validation_email",
                 "validation_phone_number", "last_login")),  # M1
    "organizations": EntitySpec(
        "organizations", schemas.ORGANIZATIONS, _organizations_flatten,
        mutable=("deleted",), parents=("users",)),  # M2
    "trades": EntitySpec(
        "trades", schemas.TRADES, _trades_flatten,
        mutable=("date", "status", "notes", "deleted"),
        parents=("organizations", "users")),  # M3
    "agribusinesses": EntitySpec(
        "agribusinesses", schemas.AGRIBUSINESSES, _agribusinesses_flatten,
        mutable=("business_details_name", "contact_deleted", "deleted"),
        parents=("users",)),  # M4
    "invoices": EntitySpec(
        "invoices", schemas.INVOICES, _invoices_flatten,
        mutable=("deleted", "status"), parents=("users",)),  # M5
    "cashflow_events": EntitySpec(
        "cashflow_events", schemas.CASHFLOW_EVENTS, _cashflow_events_flatten,
        mutable=("deleted", "status", "date"), parents=("users",)),  # M6
    "cashflow_event_goals": EntitySpec(
        "cashflow_event_goals", schemas.CASHFLOW_EVENT_GOALS,
        _cashflow_event_goals_flatten,
        mutable=("deleted", "status", "date"), parents=("users",)),  # M7
    "accounts": EntitySpec(
        "accounts", schemas.ACCOUNTS, _accounts_flatten,
        mutable=("details", "service", "on_model", "deleted", "validated")),  # M8
    "loanapplications": EntitySpec(
        "loanapplications", schemas.LOAN_APPLICATIONS,
        _loanapplications_flatten, merge_key="products",
        mutable=("deleted", "status"), pre=_loanapplications_pre,
        parents=("loandeals",)),  # M9: conflict on exploded products value
    "mlscore": EntitySpec(
        "mlscore", schemas.MLSCORE,
        _identity_flatten("_id", "loanId", "score", "categoriesTotalScore"),
        mutable=("score", "categoriesTotalScore"),
        parents=("loanapplications",)),  # M10
    "loanoffers": EntitySpec(
        "loanoffers", schemas.LOAN_OFFERS,
        _identity_flatten("_id", "financedAmount", "period", "minOffer", "optOffer"),
        insert_only=True),  # M11
    "loanproducts": EntitySpec(
        "loanproducts", schemas.LOAN_PRODUCTS,
        _identity_flatten("_id", "name", "productType", "type", "sellersType",
                          "totalBuyingPrice"),
        insert_only=True),  # M12
    "loandeals": EntitySpec(
        "loandeals", schemas.LOAN_DEALS,
        _identity_flatten("_id", "minOffer", "totalBuying", "periodWeeks", "deleted"),
        insert_only=True),  # M13
}


def _dt(y: int, mo: int, d: int):
    from datetime import datetime
    return datetime(y, mo, d)


#: The reference's per-collection MongoDB aggregation pipelines, VERBATIM
#: (each cited to its dags/includes module). They run through
#: sources/mongoql.apply_pipeline against nested fixtures, and the same
#: lists serialize into the live connector's server-side
#: ``aggregation.pipeline`` option — one definition, both paths. The
#: pipeline output feeds each EntitySpec's flatten unchanged (dotted
#: $project includes keep Mongo's nested shape).
REFERENCE_PIPELINES: dict[str, list[dict]] = {
    # ref user_table.py:25-53
    "users": [{"$project": {
        "username": 1,
        "personalInformation.firstName": 1,
        "personalInformation.lastName": 1,
        "personalInformation.email": 1,
        "personalInformation.phoneNumber": 1,
        "companyInformation.companyName": 1,
        "roles": 1, "deleted": 1, "blocked": 1, "hasPassword": 1,
        "loggedIn": 1, "accountReviewed": 1, "validations": 1,
        "lastLogin": 1, "dateCreated": 1}}],
    # ref organizations_table.py:25-52
    "organizations": [{"$project": {
        "businessName": 1, "businessAddress": 1, "registrationNumber": 1,
        "type": 1, "valueChain": 1, "createdBy": 1, "orgUser": 1,
        "owner": 1, "deleted": 1, "dateCreated": 1,
        "onboardingInformation": 1}}],
    # ref trades_table.py:25-52
    "trades": [{"$project": {
        "type": 1, "name": 1, "products": 1, "totalPrice": 1, "number": 1,
        "organization": 1, "createdBy": 1, "notes": 1, "status": 1,
        "deleted": 1, "date": 1, "dueDate": 1, "dateCreated": 1}}],
    # ref agribusiness_table.py:25-45
    "agribusinesses": [{"$project": {
        "organization": 1, "businessDetails": 1, "referrers": 1,
        "contacts": 1, "createdBy": 1, "deleted": 1, "dateCreated": 1}}],
    # ref invoices_table.py:25-56
    "invoices": [{"$project": {
        "organization": 1, "name": 1, "address": 1, "phoneNumber": 1,
        "email": 1, "paymentTerms": 1, "paymentMethod": 1,
        "termsAndConditions": 1, "taxPercentaje": 1, "total": 1,
        "createdBy": 1, "products": 1, "deleted": 1, "status": 1,
        "issueDate": 1, "supplyDate": 1, "dueDate": 1, "dateCreated": 1}}],
    # ref cashflow_events_table.py:25-50
    "cashflow_events": [{"$project": {
        "organization": 1, "products": 1, "amount": 1, "type": 1,
        "createdBy": 1, "deleted": 1, "status": 1, "date": 1,
        "dateCreated": 1}}],
    # ref cashflow_events_goals_table.py:25-48
    "cashflow_event_goals": [{"$project": {
        "organization": 1, "totalAmount": 1, "monthAmount": 1, "goal": 1,
        "way": 1, "notify": 1, "createdBy": 1, "deleted": 1, "status": 1,
        "date": 1, "dateCreated": 1}}],
    # ref accounts_table.py:25-44
    "accounts": [{"$project": {
        "beneficiaryId": 1, "details": 1, "service": 1, "createdBy": 1,
        "onModel": 1, "deleted": 1, "validated": 1, "dateCreated": 1}}],
    # ref loanapplication_table.py:26-49 — the only $match + $unwind one
    "loanapplications": [
        {"$match": {"dateCreated": {"$gt": _dt(2022, 10, 5)}}},
        {"$unwind": {"path": "$products"}},
        {"$project": {
            "personalDetails.email": 1,
            "personalDetails.primaryPhoneNumber": 1,
            "businessDetails.name": 1,
            "deleted": 1, "dateCreated": 1, "assignee": 1, "status": 1,
            "products": 1, "dealId": 1}}],
    # ref mlscore_table.py:25-34
    "mlscore": [{"$project": {
        "loanId": 1, "score": 1, "categoriesTotalScore": 1,
        "dateCreated": 1}}],
    # ref loanoffers_table.py:25-35
    "loanoffers": [{"$project": {
        "financedAmount": 1, "period": 1, "minOffer": 1, "optOffer": 1}}],
    # ref loanproducts_table.py:25-36
    "loanproducts": [{"$project": {
        "name": 1, "productType": 1, "type": 1, "sellersType": 1,
        "totalBuyingPrice": 1}}],
    # ref loandeals_table.py:25-34
    "loandeals": [{"$project": {
        "minOffer": 1, "totalBuying": 1, "periodWeeks": 1, "deleted": 1}}],
}


def topo_order(names=None) -> list[str]:
    """Parents-first load order (replaces the reference's hardcoded DAG
    chain, ref mongo_to_postgres_migration.py:199).

    Names with no ENTITIES spec are appended LAST rather than raising
    here: ordering runs before the runner's per-table isolation loop, so
    a KeyError at this level would abort every sibling — the unknown
    name instead flows into the loop and is recorded as that table's own
    failure (pipeline.py::_run_entities isolation contract)."""
    names = list(names or ENTITIES)
    known = [n for n in names if n in ENTITIES]
    unknown = [n for n in names if n not in ENTITIES]
    seen: list[str] = []

    def visit(n: str, stack: tuple[str, ...] = ()):
        if n in seen or n not in known:
            return
        if n in stack:
            raise ValueError(f"FK cycle at {n}")
        for p in ENTITIES[n].parents:
            visit(p, stack + (n,))
        seen.append(n)

    for n in known:
        visit(n)
    return seen + unknown
