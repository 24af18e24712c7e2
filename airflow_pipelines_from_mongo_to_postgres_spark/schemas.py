"""Declared input schemas — one StructType per source entity, the single
source of truth (SURVEY.md §1.3: the reference duplicates schema knowledge
across $project lists, flatten loops and DDL; here it lives once).

Shapes follow FIXTURES.md / the reference's 13 MongoDB collections
(ref dags/includes/*.py $project stages).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _s(name, dt=StringType()):
    return StructField(name, dt, True)


PRODUCT_STRUCT = StructType([
    _s("productId"), _s("name"), _s("packageSize", DoubleType()),
    _s("measurementUnit"), _s("unitPrice", DoubleType()),
    _s("quantity", DoubleType()),
])

CONTACT_STRUCT = StructType([
    _s("_id"), _s("firstName"), _s("lastName"),
    _s("deleted", BooleanType()), _s("dateCreated", TimestampType()),
])

#: users (ref dags/includes/user_table.py:25-87)
USERS = StructType([
    _s("_id"), _s("username"),
    _s("personalInformation", StructType([
        _s("firstName"), _s("lastName"), _s("email"), _s("phoneNumber")])),
    _s("companyInformation", StructType([_s("companyName")])),
    _s("roles", ArrayType(StringType())),
    _s("deleted", BooleanType()), _s("blocked", BooleanType()),
    _s("hasPassword", BooleanType()), _s("loggedIn", BooleanType()),
    _s("accountReviewed", BooleanType()),
    _s("validations", StructType([
        _s("email", BooleanType()), _s("phoneNumber", BooleanType())])),
    _s("dateCreated", TimestampType()), _s("lastLogin", TimestampType()),
])

#: organizations (ref dags/includes/organizations_table.py:27-86)
ORGANIZATIONS = StructType([
    _s("_id"), _s("businessName"), _s("registrationNumber"), _s("type"),
    _s("valueChain"), _s("createdBy"), _s("orgUser"), _s("owner"),
    _s("deleted", BooleanType()), _s("dateCreated", TimestampType()),
    _s("onboardingInformation", StructType([
        _s("businessOperations"), _s("businessLine"), _s("businessType"),
        _s("businessDateCreated"), _s("businessOwner"),
        _s("employeesAmount"), _s("avenewsReason")])),
])

#: trades (ref dags/includes/trades_table.py:32-92)
TRADES = StructType([
    _s("_id"), _s("type"), _s("name"),
    _s("products", ArrayType(PRODUCT_STRUCT)),
    _s("totalPrice", DoubleType()), _s("number"),
    _s("organization"), _s("createdBy"), _s("notes"), _s("status"),
    _s("deleted", BooleanType()),
    _s("date", TimestampType()), _s("dueDate", TimestampType()),
    _s("dateCreated", TimestampType()),
])

#: agribusinesses (ref dags/includes/agribusiness_table.py:32-87)
AGRIBUSINESSES = StructType([
    _s("_id"), _s("organization"),
    _s("businessDetails", StructType([_s("name"), _s("phoneNumber")])),
    _s("referrers", ArrayType(StringType())),
    _s("contacts", ArrayType(CONTACT_STRUCT)),
    _s("createdBy"), _s("deleted", BooleanType()),
    _s("dateCreated", TimestampType()),
])

#: invoices (ref dags/includes/invoices_table.py:31-109)
INVOICES = StructType([
    _s("_id"), _s("organization"), _s("name"), _s("phoneNumber"), _s("email"),
    _s("paymentTerms", DoubleType()), _s("paymentMethod"),
    _s("termsAndConditions"), _s("taxPercentaje", DoubleType()),
    _s("createdBy"), _s("products", ArrayType(PRODUCT_STRUCT)),
    _s("deleted", BooleanType()), _s("status"),
    _s("issueDate", TimestampType()), _s("supplyDate", TimestampType()),
    _s("dueDate", TimestampType()), _s("dateCreated", TimestampType()),
])

#: cashflowevents (ref dags/includes/cashflow_events_table.py:25-75)
CASHFLOW_EVENTS = StructType([
    _s("_id"), _s("organization"), _s("amount", DoubleType()), _s("type"),
    _s("createdBy"), _s("products", ArrayType(PRODUCT_STRUCT)),
    _s("deleted", BooleanType()), _s("status"),
    _s("date", TimestampType()), _s("dateCreated", TimestampType()),
])

#: cashfloweventgoals (ref dags/includes/cashflow_events_goals_table.py:25-74)
CASHFLOW_EVENT_GOALS = StructType([
    _s("_id"), _s("organization"), _s("totalAmount", DoubleType()),
    _s("monthAmount", DoubleType()), _s("goal"), _s("way"), _s("notify"),
    _s("createdBy"), _s("deleted", BooleanType()), _s("status"),
    _s("date", TimestampType()), _s("dateCreated", TimestampType()),
])

#: accounts (ref dags/includes/accounts_table.py:25-68)
ACCOUNTS = StructType([
    _s("_id"), _s("beneficiaryId"),
    _s("details", StructType([_s("bank"), _s("accountNumber"), _s("branch")])),
    _s("service"), _s("createdBy"), _s("onModel"),
    _s("deleted", BooleanType()), _s("validated", BooleanType()),
    _s("dateCreated", TimestampType()),
])

#: loanapplications (ref dags/includes/loanapplication_table.py:25-69)
LOAN_APPLICATIONS = StructType([
    _s("_id"),
    _s("personalDetails", StructType([_s("email"), _s("primaryPhoneNumber")])),
    _s("businessDetails", StructType([_s("name")])),
    _s("deleted", BooleanType()), _s("dateCreated", TimestampType()),
    _s("assignee"), _s("status"),
    _s("products", ArrayType(StringType())),
    _s("dealId"),
])

#: loanoffers (ref dags/includes/loanoffers_table.py:25-50)
LOAN_OFFERS = StructType([
    _s("_id"), _s("financedAmount", DoubleType()), _s("period", IntegerType()),
    _s("minOffer", DoubleType()), _s("optOffer", DoubleType()),
])

#: loanproducts (ref dags/includes/loanproducts_table.py:25-52)
LOAN_PRODUCTS = StructType([
    _s("_id"), _s("name"), _s("productType"), _s("type"), _s("sellersType"),
    _s("totalBuyingPrice", DoubleType()),
])

#: loandeals (ref dags/includes/loandeals_table.py:25-49)
LOAN_DEALS = StructType([
    _s("_id"), _s("minOffer", DoubleType()), _s("totalBuying", DoubleType()),
    _s("periodWeeks", DoubleType()), _s("deleted", BooleanType()),
])

#: mlscoredatas (ref dags/includes/mlscore_table.py:25-49)
MLSCORE = StructType([
    _s("_id"), _s("loanId"), _s("score", DoubleType()),
    _s("categoriesTotalScore", DoubleType()),
    _s("dateCreated", TimestampType()),
])

ENTITY_SCHEMAS: dict[str, StructType] = {
    "users": USERS,
    "organizations": ORGANIZATIONS,
    "trades": TRADES,
    "agribusinesses": AGRIBUSINESSES,
    "invoices": INVOICES,
    "cashflow_events": CASHFLOW_EVENTS,
    "cashflow_event_goals": CASHFLOW_EVENT_GOALS,
    "accounts": ACCOUNTS,
    "loanapplications": LOAN_APPLICATIONS,
    "loanoffers": LOAN_OFFERS,
    "loanproducts": LOAN_PRODUCTS,
    "loandeals": LOAN_DEALS,
    "mlscore": MLSCORE,
}
