from .explorer import Explorer, interactive_play
from .log import Logger
from .session import Session, load_pytree, save_pytree
