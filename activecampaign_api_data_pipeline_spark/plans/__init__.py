"""End-to-end query plans (marts, persistence layers)."""
