from videoquery.service.client import ActionClient, HTTPTransport, authenticate
from videoquery.service.repository import APIRepository
from videoquery.service.ticket import Ticket
from videoquery.service.compute_matches import compute_matches
from videoquery.service.loader import DBLoader

__all__ = [
    "ActionClient",
    "HTTPTransport",
    "authenticate",
    "APIRepository",
    "Ticket",
    "compute_matches",
    "DBLoader",
]
