from .parser import parse, Config
