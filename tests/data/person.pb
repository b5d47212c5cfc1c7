
John"