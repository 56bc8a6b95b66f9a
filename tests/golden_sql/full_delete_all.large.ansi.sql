DELETE FROM resources w WHERE w."baseurl" = 'https://api.example.org' AND w."path" = '/things';

INSERT INTO resources ("href", "key", "modified", "jsondata", "resourcetype", "path", "baseurl") SELECT "href", "key", "modified", "jsondata", "resourcetype", "path", "baseurl" FROM stg;
