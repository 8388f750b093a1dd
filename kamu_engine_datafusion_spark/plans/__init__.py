"""ODF plan layer: request/response DTOs and the transform lifecycle."""
