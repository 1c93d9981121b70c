"""Encryption: SCRYPT key stretch + AES-CBC-CTS block crypto (lrzip -e)."""
