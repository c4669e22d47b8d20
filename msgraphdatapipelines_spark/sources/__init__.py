"""Sources (SURVEY.md §2.1): paged REST/OData ingestion + file scans."""
