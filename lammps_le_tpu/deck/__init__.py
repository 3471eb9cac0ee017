from .parser import Deck, parse_deck, parse_file  # noqa: F401
from .runner import DeckRunner  # noqa: F401
